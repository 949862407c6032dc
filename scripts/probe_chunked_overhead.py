"""Probe: compute-side overhead of the chunked compare-split exchange
(VERDICT r3 item 6 / round-3 NEXT #5).

The chunked flag (EVENTQL_TPU_EXCHANGE_CHUNKS) splits each bitonic
stage's ppermute into C chunk transfers so chunk c's compare/select can
run under chunk c+1's transfer on real ICI. Real multi-chip ICI is not
reachable from this image, but the flag's COST is: the per-stage
compute (chunked slice + reverse + concat + lex select + bitonic merge
re-sort) runs on the single real chip here for C in {1, 2, 4, 8}. The
delta vs C=1 is the price the overlap must beat — combined with the
link model (parallel/exchange_model.py) that gives the projected net
benefit.

Run: python scripts/probe_chunked_overhead.py  (real chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from eventql_tpu.parallel.distributed import _lex_lt
    from eventql_tpu.parallel.distributed import _bitonic_merge_resort

    from bench import _relay_rtt

    n = int(os.environ.get("BENCH_ROWS", 1 << 22))
    reps = int(os.environ.get("BENCH_REPS", 8))
    rng = np.random.default_rng(42)
    keys = np.sort(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    pays = rng.integers(0, 1 << 62, n).astype(np.int64)
    o_keys_h = np.sort(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    o_pays_h = rng.integers(0, 1 << 62, n).astype(np.int64)

    rtt = _relay_rtt()
    print(f"n={n} reps={reps} relay rtt {rtt * 1e3:.1f} ms")
    # NOTE: the stage is timed as DIRECT calls, not a fori_loop chain —
    # wrapping lax.sort-class ops in fori_loop measured ~20x slower on
    # this backend (carry relayout per iteration), an artifact of the
    # harness, not the op.

    kd, pd = jnp.asarray(keys), jnp.asarray(pays)
    okd, opd = jnp.asarray(o_keys_h), jnp.asarray(o_pays_h)

    results = {}
    for chunks in (1, 2, 4, 8):
        csize = n // chunks

        @jax.jit
        def stage(kl, pl, ok_raw, op_raw, salt):
            # mimic the post-ppermute view: the partner's run arrives
            # chunked (send order C-1-c) and is reversed per chunk —
            # identical elementwise result to a whole-run reverse
            def rx(a):
                if chunks == 1:
                    return a[::-1]
                return jnp.concatenate(
                    [
                        a[(chunks - 1 - c) * csize : (chunks - c) * csize][
                            ::-1
                        ]
                        for c in range(chunks)
                    ]
                )

            ok = rx(ok_raw + salt.astype(jnp.uint64))
            op = rx(op_raw)
            lt, eq = _lex_lt((kl,), (ok,))
            take = lt | eq
            k2 = jnp.where(take, kl, ok)
            p2 = jnp.where(take, pl, op)
            (k3,), (p3,) = _bitonic_merge_resort((k2,), (p2,), 1)
            return k3[-1] + p3[-1].astype(jnp.uint64)

        _ = np.asarray(stage(kd, pd, okd, opd, jnp.uint64(0)))
        ts = []
        for i in range(max(4, reps)):
            t0 = time.perf_counter()
            _ = np.asarray(stage(kd, pd, okd, opd, jnp.uint64(i)))
            ts.append(time.perf_counter() - t0)
        per_stage = max(min(ts) - rtt, 1e-9)
        rate = n / per_stage / 1e9
        results[chunks] = rate
        ovh = results[1] / rate - 1 if chunks > 1 else 0.0
        print(
            f"chunks={chunks}: per-stage compute {rate:6.3f} Grows/s"
            + (f"  (overhead vs C=1: {ovh * 100:+.1f}%)" if chunks > 1 else "")
        )

    # net projection at the default link model
    from eventql_tpu.parallel.exchange_model import project_sort

    for p in (2, 4, 8):
        base = project_sort(n, 16, p, 0.33e9, results[1] * 1e9)
        ov = project_sort(
            n, 16, p, 0.33e9, results.get(4, results[1]) * 1e9,
            overlap=True,
        )
        print(
            f"P={p}: projected eff {base['efficiency']:.3f} -> "
            f"{ov['efficiency']:.3f} with chunked overlap "
            f"(chunked compute rate, C=4)"
        )


if __name__ == "__main__":
    main()
