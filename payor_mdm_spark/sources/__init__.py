"""Sources & sinks: schema'd readers, checkpoint store, steward tables."""
