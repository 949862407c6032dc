"""Refit the attainable-model α/β on the FUSED kernel (round-5 VERDICT
item 2).

The round-3 cost model (ns/row = β + α·lanes, α = 254 fs, β = 0.040 ns,
fit on the pre-fused pallas_sum_count grid) no longer bounds the
round-4 fused kernel: BENCH_r04 measured fraction_of_attainable = 1.12,
i.e. the fused kernel beats its own "attainable" — the fused form
changed both terms (i32 streams instead of u64 + in-kernel predicate
replaced the XLA mask pass). This probe re-runs the cost grid against
`pallas_sum_count_fused` / `pallas_count_fused` across
K × value_bits × predicate shapes and fits fresh (α, β) by least
squares, reporting per-point model error. bench.py then uses the refit
constants so the published fraction is ≤ 1 by construction wherever
the model fits.

lanes = 2·k2 + 2·r_act·k1 (kernels/pallas_groupby._pick_k2 model);
the in-kernel predicate compare + pad mask + gid fold are per-row
fixed work and belong to β.

Run on the real TPU: python scripts/probe_fused_cost.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPS = int(os.environ.get("BENCH_REPS", 48))
N = int(os.environ.get("BENCH_ROWS", 1 << 24))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from eventql_tpu.kernels.pallas_groupby import (
        _pick_k2,
        pallas_count_fused,
        pallas_sum_count_fused,
    )
    rng = np.random.default_rng(42)

    # the relay RTT jitters by several ms between measurements — more
    # than a short chain's on-chip time — so nop round trips are
    # INTERLEAVED with the measured calls and subtracted pairwise
    # (bench.py sql_groupby methodology), and the chain is deep enough
    # (REPS=48) that compute dominates the residual jitter
    @jax.jit
    def _nop(x):
        return x + 1

    _ = np.asarray(_nop(jnp.int32(0)))

    def timeit(fn, *args):
        out = fn(*args)
        _ = np.asarray(out)
        diffs = []
        for i in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(_nop(jnp.int32(i)))
            t1 = time.perf_counter()
            _ = np.asarray(fn(*args))
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        diffs.sort()
        return max(diffs[len(diffs) // 2], 1e-9) / REPS

    rows = []  # (label, lanes, ns_per_row, grows, in_fit_domain)

    def record(label, lanes, per_run, in_domain):
        ns = per_run / N * 1e9
        rows.append((label, lanes, ns, N / per_run / 1e9, in_domain))
        print(
            f"{label:34s} lanes={lanes:4d}  {ns:7.4f} ns/row  "
            f"{N / per_run / 1e9:6.2f} Grows/s"
            f"{'' if in_domain else '  (out of fit domain)'}",
            flush=True,
        )

    # -- sum+count fused grid ------------------------------------------
    for K in (256, 1024, 4096, 16384, 65536):
        gid = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
        for vb in (11, 32, 64):
            nlimbs = -(-vb // 8)
            r_act = 1 + nlimbs
            k2 = _pick_k2(K, nlimbs)
            k1 = -(-K // k2)
            lanes = 2 * k2 + 2 * r_act * k1
            if vb == 11:
                vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
                pred = None
            elif vb == 32:
                vals = jnp.asarray(
                    rng.integers(0, 1 << 30, N).astype(np.int32)
                )
                pred = None
            else:
                vals = jnp.asarray(
                    rng.integers(0, 1 << 62, N).astype(np.uint64)
                )
                # u64 payloads break the pred-fits-i32 contract: ride a
                # separate i32 predicate stream (the SQL route's shape
                # for WHERE on a different column)
                pred = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
            thr = jnp.int32(800)
            n_s = jnp.int32(N)

            @jax.jit
            def pipe(gid, vals, pred, thr):
                def body(i, acc):
                    counts, sums = pallas_sum_count_fused(
                        gid, vals, thr - i, n_s, K,
                        pred=pred, value_bits=vb, pred_op="lt",
                    )
                    return acc + sums.sum() + counts.sum()

                return jax.lax.fori_loop(0, REPS, body, jnp.uint64(0))

            per_run = timeit(pipe, gid, vals, pred, thr)
            record(
                f"sum_count K={K} vb={vb}", lanes, per_run,
                vb <= 32 and k1 * r_act <= 512,
            )

    # -- count-only fused ----------------------------------------------
    for K in (1024, 16384, 65536):
        gid = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
        predv = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
        k2 = _pick_k2(K, 0)
        k1 = -(-K // k2)
        lanes = 2 * k2 + 2 * 1 * k1
        thr = jnp.int32(800)
        n_s = jnp.int32(N)

        @jax.jit
        def pipe_c(gid, predv, thr):
            def body(i, acc):
                counts = pallas_count_fused(
                    gid, thr - i, n_s, K, pred=predv, pred_op="lt"
                )
                return acc + counts.sum()

            return jax.lax.fori_loop(0, REPS, body, jnp.uint64(0))

        per_run = timeit(pipe_c, gid, predv, thr)
        record(f"count_only K={K}", lanes, per_run, k1 <= 512)

    # -- relative least-squares fit: ns = beta + alpha * lanes ---------
    # Domain = the SQL fused route's own shapes: single-chunk
    # (k1·r_act <= _MAX_ROWS = 512) and a value stream that fits one
    # i32 word (value_bits <= 32 — the route's sum_fusable gate), plus
    # count-only. vb=64 ships TWO value streams (lo+hi words, 8 limb
    # extractions/row) the lanes count does not price, and multi-chunk
    # configs pay the accumulator re-walk — both are outside the
    # route's serving domain and are excluded from the fit (reported
    # above for reference). Relative weighting (1/T) keeps the small
    # fast configs from being drowned by the big-K rows.
    in_domain = [r for r in rows if r[4]]
    L = np.array([r[1] for r in in_domain], dtype=np.float64)
    T = np.array([r[2] for r in in_domain], dtype=np.float64)
    W = 1.0 / T
    A = np.stack([np.ones_like(L) * W, L * W], axis=1)
    (beta, alpha), *_ = np.linalg.lstsq(A, T * W, rcond=None)
    pred_t = beta + alpha * L
    err = (T - pred_t) / pred_t
    print("\nfit: ns/row = beta + alpha * lanes  (route-domain configs)")
    print(f"alpha = {alpha * 1e6:.1f} fs/lane-op")
    print(f"beta  = {beta:.4f} ns/row")
    print(f"max |err| = {np.abs(err).max() * 100:.1f}%  "
          f"rms = {np.sqrt((err ** 2).mean()) * 100:.1f}%")
    for (label, lanes, ns, grows, _d), e in zip(in_domain, err):
        print(f"  {label:34s} meas {ns:7.4f}  model "
              f"{beta + alpha * lanes:7.4f}  err {e * 100:+6.1f}%")
    print(json.dumps({
        "alpha_fs_per_lane_op": round(float(alpha * 1e6), 2),
        "beta_ns_per_row": round(float(beta), 4),
        "max_abs_err_pct": round(float(np.abs(err).max() * 100), 1),
        "rms_err_pct": round(float(np.sqrt((err ** 2).mean()) * 100), 1),
        "n_rows": N,
        "points": [
            {"label": lab, "lanes": int(l), "ns_per_row": round(t, 4),
             "grows": round(g, 2), "in_fit_domain": d}
            for (lab, l, t, g, d) in rows
        ],
    }))


if __name__ == "__main__":
    main()
