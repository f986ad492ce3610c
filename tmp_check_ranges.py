"""Cross-check _sr_ranges' gather-free expansion against brute force."""
import numpy as np
import jax.numpy as jnp
from nbody_tpu.utils.platform import force_cpu
force_cpu(1)
from nbody_tpu.ops import pm


def brute(slab_lo, slab_hi, nc, sub, e_max, symmetric, paired):
    i32 = np.int32
    slab_lo = np.asarray(slab_lo); slab_hi = np.asarray(slab_hi)
    s_max = slab_lo.shape[0]
    n_cells = nc ** 3
    offs = sorted((ox * nc + oy) * nc for ox in range(-sub, sub + 1)
                  for oy in range(-sub, sub + 1))
    ent_t, ent_s = [], []
    sent_s = s_max // 2 if paired else s_max
    for t in range(s_max):
        if slab_lo[t] >= n_cells:
            continue
        run = 0
        iv = []
        for off in offs:
            lo_w = slab_lo[t] + off - sub
            hi_w = min(slab_hi[t] + off + sub, n_cells - 1)
            s0 = int(np.searchsorted(slab_hi, lo_w, side="left"))
            s1 = int(np.searchsorted(slab_lo, hi_w, side="right"))
            s0 = max(s0, run)
            if symmetric:
                s0 = max(s0, t)
            s1 = max(s1, s0)
            run = max(run, s1)
            iv.append((s0, s1))
        if paired:
            run_r = 0
            iv2 = []
            for (s0, s1) in iv:
                r0 = s0 // 2
                r1 = (s1 + 1) // 2 if s1 > s0 else r0
                r0 = max(r0, run_r)
                r1 = max(r1, r0)
                run_r = max(run_r, r1)
                iv2.append((r0, r1))
            iv = iv2
        for (s0, s1) in iv:
            for s in range(s0, s1):
                ent_t.append(t); ent_s.append(s)
    n_e = len(ent_t)
    wl_t = np.full(e_max, s_max, i32)
    wl_s = np.full(e_max, sent_s, i32)
    k = min(n_e, e_max)
    wl_t[:k] = ent_t[:k]; wl_s[:k] = ent_s[:k]
    # positions in [min(n_e, e_max), e_max) are sentinel; positions
    # beyond e_max dropped.  NOTE: jax masks with ok = e_idx < n_e, so
    # when n_e > e_max nothing is sentinel — handled by caller planning.
    return wl_t, wl_s, n_e


rng = np.random.default_rng(0)
for trial in range(60):
    nc = int(rng.integers(3, 8))
    sub = int(rng.integers(1, 3))
    n_cells = nc ** 3
    s_max = int(rng.integers(2, 14))
    # random sorted, disjoint slab [lo, hi] cid bounds, some padding slabs
    n_real = int(rng.integers(1, s_max + 1))
    cuts = np.sort(rng.choice(n_cells, size=min(2 * n_real, n_cells),
                              replace=False))
    los, his = [], []
    for i in range(0, len(cuts) - 1, 2):
        los.append(cuts[i]); his.append(cuts[i + 1])
    while len(los) < s_max:
        los.append(n_cells); his.append(n_cells)
    slab_lo = jnp.asarray(np.array(los[:s_max], np.int32))
    slab_hi = jnp.asarray(np.array(his[:s_max], np.int32))
    for symmetric in (False, True):
        for paired in (False, True):
            for e_max in (4, 64, 4096):
                got_t, got_s, got_n = pm._sr_ranges(
                    slab_lo, slab_hi, nc, sub, e_max,
                    symmetric=symmetric, paired=paired)
                want_t, want_s, want_n = brute(
                    slab_lo, slab_hi, nc, sub, e_max, symmetric, paired)
                got_t = np.asarray(got_t); got_s = np.asarray(got_s)
                assert int(got_n) == want_n, (trial, symmetric, paired,
                                              e_max, int(got_n), want_n)
                k = min(want_n, e_max)
                assert (got_t[:k] == want_t[:k]).all(), (
                    trial, symmetric, paired, e_max, "t",
                    np.nonzero(got_t[:k] != want_t[:k])[0][:5])
                assert (got_s[:k] == want_s[:k]).all(), (
                    trial, symmetric, paired, e_max, "s",
                    np.nonzero(got_s[:k] != want_s[:k])[0][:5])
                if want_n < e_max:
                    assert (got_t[want_n:] == s_max).all()
                    sent = s_max // 2 if paired else s_max
                    assert (got_s[want_n:] == sent).all()
print("OK: 60 trials x {sym,paired} x {e_max 4,64,4096} all exact")
