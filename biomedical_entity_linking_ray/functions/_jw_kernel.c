/* Batched Jaro-Winkler over a UTF-32 string table.
 *
 * Bit-identical to the pure-Python implementation in strings.py (same greedy
 * window matching, same transposition count, same float64 operation order);
 * compiled lazily by strings._load_jw_kernel() with `cc -O2 -shared -fPIC`
 * and loaded via ctypes.  Pure C99 + libc only.
 *
 * The greedy matcher is the textbook O(len1 * window) scan with a `used`
 * flag per s2 position; it is equivalent to the Python position-list/pointer
 * variant because a position skipped below the window lower bound can never
 * re-enter the window (the bound is monotone in i).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define STACK_LEN 512

static double jaro_one(const uint32_t *a, int64_t la,
                       const uint32_t *b, int64_t lb,
                       uint8_t *used, uint8_t *amatch)
{
    if (la == lb && memcmp(a, b, (size_t)la * 4) == 0)
        return 1.0;   /* matches Python: s1 == s2 checked before emptiness */
    if (la == 0 || lb == 0)
        return 0.0;
    int64_t w = (la > lb ? la : lb) / 2 - 1;
    if (w < 0)
        w = 0;
    memset(used, 0, (size_t)lb);
    memset(amatch, 0, (size_t)la);
    int64_t m = 0;
    for (int64_t i = 0; i < la; i++) {
        int64_t lo = i > w ? i - w : 0;
        int64_t hi = i + w + 1;
        if (hi > lb)
            hi = lb;
        uint32_t c = a[i];
        for (int64_t j = lo; j < hi; j++) {
            if (!used[j] && b[j] == c) {
                used[j] = 1;
                amatch[i] = 1;
                m++;
                break;
            }
        }
    }
    if (m == 0)
        return 0.0;
    int64_t half_transpositions = 0;
    int64_t j = 0;
    for (int64_t i = 0; i < la; i++) {
        if (!amatch[i])
            continue;
        while (!used[j])
            j++;
        if (a[i] != b[j])
            half_transpositions++;
        j++;
    }
    double t = (double)half_transpositions / 2.0;
    double dm = (double)m;
    return (dm / (double)la + dm / (double)lb + (dm - t) / dm) / 3.0;
}

/* buf: concatenated UTF-32 code points of the string table
 * offs: n_strings+1 offsets (in code points) into buf
 * ia/ib: per pair, indices into the string table
 * out: n_pairs doubles */
void jw_batch(const uint32_t *buf, const int64_t *offs,
              const int64_t *ia, const int64_t *ib, int64_t n_pairs,
              double *out, double prefix_weight, int64_t max_prefix)
{
    uint8_t stack_used[STACK_LEN], stack_amatch[STACK_LEN];
    for (int64_t p = 0; p < n_pairs; p++) {
        int64_t sa = offs[ia[p]], la = offs[ia[p] + 1] - sa;
        int64_t sb = offs[ib[p]], lb = offs[ib[p] + 1] - sb;
        const uint32_t *a = buf + sa;
        const uint32_t *b = buf + sb;
        uint8_t *used = stack_used, *amatch = stack_amatch;
        int heap = (lb > STACK_LEN) || (la > STACK_LEN);
        if (heap) {
            used = (uint8_t *)malloc((size_t)(la + lb));
            if (!used) { out[p] = -1.0; continue; }  /* caller falls back */
            amatch = used + lb;
        }
        double jv = jaro_one(a, la, b, lb, used, amatch);
        if (jv > 0.7) {
            int64_t maxp = la < lb ? la : lb;
            if (maxp > max_prefix)
                maxp = max_prefix;
            int64_t prefix = 0;
            while (prefix < maxp && a[prefix] == b[prefix])
                prefix++;
            jv = jv + (double)prefix * prefix_weight * (1.0 - jv);
        }
        out[p] = jv;
        if (heap)
            free(used);
    }
}
