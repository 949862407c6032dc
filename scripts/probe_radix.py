"""Probe: block-radix partition sort primitives (VERDICT r2 item 1).

The proposed design for full ORDER BY — per-block histogram (MXU) →
exclusive (block,bucket) prefix → per-block bucket grouping →
dynamic-offset DMA of contiguous per-(block,bucket) runs → per-bucket
final sorts — rests on FOUR measurable constants:

  A. block-sort rate vs block size (the grouping primitive AND the
     final per-bucket sorts). Measured two formulations:
     row-major batched (nb, B) sort along dim 1 — SLOWER than flat —
     and the "colsort" formulation reshape(C, B).T sorted along dim 0,
     which tracks the bitonic stage model exactly.
  B. dynamic-offset DMA copy rate vs run length (the placement pass:
     one descriptor per (block,bucket) run, staged through VMEM)
  C. histogram rate at S=256..2048 buckets (pallas_count)
  D. HBM gather rate (the alternative permutation-apply primitive)

Findings (v5e, 2026-08; written up in PERF.md "Block-radix partition
sort — falsified by measurement"):
  * lax.sort IS stage-model optimal: rate ≈ C0 / stages(n) with
    C0 ≈ 90 G·stages measured at two sizes (flat 8.4M: 0.365 G vs
    model 276 stages; colsort B=16K: 0.861 G vs model 105 stages →
    prediction 0.857). No decomposition wins: total bitonic stages are
    conserved.
  * placement DMA costs ~550-900 ns/descriptor → runs must be ≥4K
    elements for >4 Grows/s; grouping into ≥4K-element runs needs
    block sorts of B = S·4K ≥ 1M whose stage count is ≥60% of the
    full sort's, per radix pass.
  * gather: 0.142 Grows/s (window-sorted no better) — 40x too slow
    for permutation apply.

Run on the real chip: python scripts/probe_radix.py [--quick]
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_enable_x64", True)

_RTT = None


def relay_rtt():
    """This session's relay round trip (bench.py methodology: the TPU
    is reached through a relay whose fixed round trip must be
    subtracted; block_until_ready does NOT block through it — a host
    fetch does)."""
    global _RTT
    if _RTT is not None:
        return _RTT

    @jax.jit
    def nop(x):
        return x + 1

    _ = np.asarray(nop(jnp.int32(0)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(nop(jnp.int32(i)))
        ts.append(time.perf_counter() - t0)
    _RTT = min(ts)
    return _RTT


def _fetch(out):
    if isinstance(out, (tuple, list)):
        out = out[0]
    return np.asarray(out[:1]) if getattr(out, "ndim", 0) else np.asarray(out)


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    dt = max(min(ts) - relay_rtt(), 1e-9)
    return dt, out


def grows(n, dt):
    return n / dt / 1e9


# -- A. sorts: flat vs colsort (chained to amortize the relay) --------------

REPS = 16


@jax.jit
def flat_chain(k, p):
    def body(i, carry):
        a, b = carry
        ks, ps = jax.lax.sort([a, b], num_keys=1, is_stable=True)
        return (ks ^ (ks >> 16) ^ jnp.uint32(i), ps)

    a, _b = jax.lax.fori_loop(0, REPS, body, (k, p))
    return jnp.sum(a.astype(jnp.uint64))


@functools.partial(jax.jit, static_argnames=("ncols",))
def colsort_chain(k, p, ncols):
    kk = k.reshape(ncols, -1).T  # (B, C): column j = contiguous block j
    pp = p.reshape(ncols, -1).T

    def body(i, carry):
        a, b = carry
        ks, ps = jax.lax.sort(
            [a, b], dimension=0, num_keys=1, is_stable=True
        )
        return (ks ^ (ks >> 16) ^ jnp.uint32(i), ps)

    a, _b = jax.lax.fori_loop(0, REPS, body, (kk, pp))
    return jnp.sum(a.astype(jnp.uint64))


def probe_sorts(n):
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    payload = jnp.arange(n, dtype=jnp.int32)
    print(f"\n-- A. sort rates at n={n/1e6:.1f}M (u32 key + i32 payload,"
          f" {REPS}-chained)")

    def stages(m):
        lg = int(np.ceil(np.log2(m)))
        return lg * (lg + 1) // 2

    dt, _ = timeit(flat_chain, keys, payload)
    r = grows(n, dt / REPS)
    print(f"  flat lax.sort:      {r:7.3f} Grows/s"
          f"   (C0 = {r * stages(n):5.1f} G·stages)")
    for ncols in (64, 512, 2048):
        B = n // ncols
        dt, _ = timeit(
            functools.partial(colsort_chain, ncols=ncols), keys, payload
        )
        r = grows(n, dt / REPS)
        print(f"  colsort B={B:>8}: {r:7.3f} Grows/s"
              f"   (C0 = {r * stages(B):5.1f} G·stages)")


# -- B. dynamic-offset DMA placement ----------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _placement_kernel(src_off_ref, dst_off_ref, src_ref, dst_ref, buf,
                      sem_in, sem_out, *, rows):
    i = pl.program_id(0)
    s = src_off_ref[i]
    d = dst_off_ref[i]
    in_dma = pltpu.make_async_copy(
        src_ref.at[pl.ds(s, rows), :], buf, sem_in
    )
    in_dma.start()
    in_dma.wait()
    out_dma = pltpu.make_async_copy(
        buf, dst_ref.at[pl.ds(d, rows), :], sem_out
    )
    out_dma.start()
    out_dma.wait()


@functools.partial(jax.jit, static_argnames=("rows", "nruns"))
def placement(src, src_off, dst_off, rows, nruns):
    return pl.pallas_call(
        functools.partial(_placement_kernel, rows=rows),
        grid=(nruns,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_off, dst_off, src)


def probe_placement(n):
    print(f"\n-- B. dynamic-offset DMA placement at n={n/1e6:.1f}M u32"
          f" (VMEM-staged, serialized per run — a double-buffered"
          f" variant would roughly double these)")
    rng = np.random.default_rng(3)
    src = jnp.asarray(
        rng.integers(0, 2**32, n, dtype=np.uint32).reshape(-1, 128)
    )
    for chunk in (256, 1024, 4096, 16384):
        rows = chunk // 128
        nruns = n // chunk
        if nruns > 65536:
            # the per-run offset arrays live in SMEM; cap the count
            # (per-descriptor cost is what's being measured, not n)
            nruns = 65536
        perm = rng.permutation(nruns)
        src_off = jnp.asarray((np.arange(nruns) * rows).astype(np.int32))
        dst_off = jnp.asarray((perm * rows).astype(np.int32))
        dt, out = timeit(
            functools.partial(placement, rows=rows, nruns=nruns),
            src, src_off, dst_off,
        )
        ok = bool(
            (np.asarray(out[perm[0] * rows]) == np.asarray(src[0])).all()
        )
        ncopy = nruns * chunk
        print(f"  run={chunk:>6}: {grows(ncopy, dt):7.3f} Grows/s "
              f"({nruns} DMAs, {dt*1e9/nruns:6.0f} ns/run, ok={ok})")


# -- C. histogram ------------------------------------------------------------


def probe_histogram(n):
    from eventql_tpu.kernels.pallas_groupby import pallas_count

    print(f"\n-- C. histogram (pallas_count) at n={n/1e6:.1f}M")
    rng = np.random.default_rng(5)
    keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    mask = jnp.ones(n, bool)
    for bits in (8, 11):
        S = 1 << bits
        gid = (keys >> (32 - bits)).astype(jnp.int32)

        @jax.jit
        def hist(m, g, S=S):
            return pallas_count(m, g, S)

        dt, _ = timeit(hist, mask, gid)
        print(f"  S={S:>5}: {grows(n, dt):7.3f} Grows/s")


# -- D. gather ---------------------------------------------------------------


def probe_gather(n):
    print(f"\n-- D. HBM gather (permutation apply) at n={n/1e6:.1f}M")
    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    @jax.jit
    def gather(v, p):
        return jnp.take(v, p, axis=0)

    dt, _ = timeit(gather, vals, perm)
    print(f"  random perm gather:   {grows(n, dt):7.3f} Grows/s")

    wperm = np.asarray(perm).reshape(-1, 65536)
    wperm = np.sort(wperm, axis=1).reshape(-1)
    dt, _ = timeit(gather, vals, jnp.asarray(wperm))
    print(f"  window-sorted gather: {grows(n, dt):7.3f} Grows/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=33_554_432)
    args = ap.parse_args()
    n = 8_388_608 if args.quick else args.n
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    probe_sorts(n)
    probe_histogram(n)
    probe_gather(n)
    probe_placement(n)
