/*
 * Native similarity kernels: Jaro-Winkler + character-trigram cosine.
 *
 * Same published algorithms as the pure-Python kernels in
 * payor_mdm_spark/functions/similarity.py (which remain the reference
 * implementation and the fallback): identical greedy matching, identical
 * arithmetic expressions on IEEE doubles, so results are bit-identical for
 * ASCII inputs (non-ASCII routes to the Python path — byte vs codepoint
 * indexing would otherwise diverge).
 *
 * Built on demand with `gcc -O3 -shared -fPIC` and bound via ctypes — no
 * third-party packages involved (see functions/native_kernels.py).
 */

#include <math.h>
#include <stdint.h>
#include <string.h>

/* ---------------- Jaro / Jaro-Winkler ---------------- */

static double jaro(const unsigned char *a, int la,
                   const unsigned char *b, int lb) {
    if (la == 0 || lb == 0) return 0.0;
    if (la == lb && memcmp(a, b, (size_t)la) == 0) return 1.0;

    int search = (la > lb ? la : lb) / 2 - 1;
    if (search < 0) search = 0;

    unsigned char a_flags[1024] = {0};
    unsigned char b_flags[1024] = {0};
    if (la > 1024 || lb > 1024) return -1.0; /* caller falls back */

    int matches = 0;
    for (int i = 0; i < la; i++) {
        int lo = i - search; if (lo < 0) lo = 0;
        int hi = i + search + 1; if (hi > lb) hi = lb;
        for (int j = lo; j < hi; j++) {
            if (!b_flags[j] && b[j] == a[i]) {
                a_flags[i] = 1; b_flags[j] = 1; matches++;
                break;
            }
        }
    }
    if (matches == 0) return 0.0;

    int t = 0, j = 0;
    for (int i = 0; i < la; i++) {
        if (a_flags[i]) {
            while (!b_flags[j]) j++;
            if (a[i] != b[j]) t++;
            j++;
        }
    }
    t /= 2;
    double m = (double)matches;
    return (m / la + m / lb + (m - t) / m) / 3.0;
}

double jaro_winkler_c(const unsigned char *a, int la,
                      const unsigned char *b, int lb) {
    double jw = jaro(a, la, b, lb);
    if (jw < 0.0) return jw; /* overflow sentinel */
    if (jw > 0.7) {
        int prefix = 0;
        int cap = la < lb ? la : lb; if (cap > 4) cap = 4;
        for (int i = 0; i < cap; i++) {
            if (a[i] != b[i]) break;
            prefix++;
        }
        jw += prefix * 0.1 * (1.0 - jw);
    }
    return jw;
}

/* batch: offsets index into one concatenated byte buffer per side */
void jaro_winkler_batch(const unsigned char *bufa, const int32_t *offa,
                        const unsigned char *bufb, const int32_t *offb,
                        int n, double *out) {
    for (int i = 0; i < n; i++) {
        out[i] = jaro_winkler_c(bufa + offa[i], offa[i + 1] - offa[i],
                                bufb + offb[i], offb[i + 1] - offb[i]);
    }
}

/* ---------------- trigram cosine ---------------- */
/* trigrams over bytes; counts in an open-addressing table keyed by the
 * 24-bit trigram. dot and the squared norms are exact integers, so
 * dot / (sqrt(na) * sqrt(nb)) is bit-identical to the Python kernel. */

#define TG_CAP 2048  /* power of two; > 3x max distinct trigrams of 1024-byte input */

/* used[]/nused track occupied slots so clearing, norm and dot loops touch
 * only the ~|s| live entries instead of all TG_CAP slots per call —
 * identical arithmetic, pure bookkeeping */
typedef struct {
    uint32_t key[TG_CAP]; int32_t cnt[TG_CAP];
    uint16_t used[TG_CAP]; int nused;
} tgtab;

static void tg_insert(tgtab *t, uint32_t key) {
    uint32_t h = (key * 2654435761u) & (TG_CAP - 1);
    for (;;) {
        if (t->cnt[h] == 0) {
            t->key[h] = key; t->cnt[h] = 1;
            t->used[t->nused++] = (uint16_t)h;
            return;
        }
        if (t->key[h] == key) { t->cnt[h]++; return; }
        h = (h + 1) & (TG_CAP - 1);
    }
}

static int32_t tg_get(const tgtab *t, uint32_t key) {
    uint32_t h = (key * 2654435761u) & (TG_CAP - 1);
    for (;;) {
        if (t->cnt[h] == 0) return 0;
        if (t->key[h] == key) return t->cnt[h];
        h = (h + 1) & (TG_CAP - 1);
    }
}

/* whole-string-as-single-gram key for inputs shorter than 3 bytes */
static void fill_table(tgtab *t, const unsigned char *s, int n, int64_t *sumsq) {
    /* clear only the slots the previous call used (cnt==0 terminates probe
     * chains exactly as the old full memset did; stale keys are inert) */
    for (int i = 0; i < t->nused; i++) t->cnt[t->used[i]] = 0;
    t->nused = 0;
    if (n >= 3) {
        for (int i = 0; i + 3 <= n; i++) {
            uint32_t key = ((uint32_t)s[i] << 16) | ((uint32_t)s[i + 1] << 8) | s[i + 2];
            tg_insert(t, key);
        }
    } else {
        /* whole short string as one gram; 0xFF top byte guarantees the key
         * can never equal a real 24-bit trigram key (python semantics: a
         * <3-char gram never equals a 3-char trigram) */
        uint32_t key = 0xFF000000u | ((uint32_t)n << 16);
        if (n > 0) key |= (uint32_t)s[0] << 8;
        if (n > 1) key |= (uint32_t)s[1];
        tg_insert(t, key);
    }
    int64_t ss = 0;
    for (int i = 0; i < t->nused; i++) {
        int64_t c = t->cnt[t->used[i]];
        ss += c * c;
    }
    *sumsq = ss;
}

double trigram_cosine_c(const unsigned char *a, int la,
                        const unsigned char *b, int lb) {
    if (la > 1024 || lb > 1024) return -1.0; /* caller falls back */
    static __thread tgtab ta, tb;
    int64_t ssa, ssb;
    fill_table(&ta, a, la, &ssa);
    fill_table(&tb, b, lb, &ssb);
    int64_t dot = 0;
    for (int i = 0; i < ta.nused; i++) {
        uint32_t h = ta.used[i];
        dot += (int64_t)ta.cnt[h] * tg_get(&tb, ta.key[h]);
    }
    double ma = sqrt((double)ssa), mb = sqrt((double)ssb);
    if (ma == 0.0 || mb == 0.0) return 0.0;
    return (double)dot / (ma * mb);
}

void trigram_cosine_batch(const unsigned char *bufa, const int32_t *offa,
                          const unsigned char *bufb, const int32_t *offb,
                          int n, double *out) {
    for (int i = 0; i < n; i++) {
        out[i] = trigram_cosine_c(bufa + offa[i], offa[i + 1] - offa[i],
                                  bufb + offb[i], offb[i + 1] - offb[i]);
    }
}
