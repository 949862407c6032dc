"""Extended differential fuzz campaign (CPU backend): run the
tests/test_fuzz_* generators over a wide seed range. Usage:

    python scripts/fuzz_campaign.py <start_seed> <n_seeds>

Prints one line per failure (seed + query); exit code 1 if any seed
diverged."""
import os
import random
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_fuzz_device_parity import (  # noqa: E402
    _gen_join_query,
    _gen_query,
    _make_join_tables,
    _make_table,
    _run,
)
from tests.test_fuzz_device_order import (  # noqa: E402
    _gen_order_query,
    _make_table as _make_order_table,
)


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    failures = 0
    for s in range(start, start + count):
        rng = random.Random(s)
        provider = _make_table(rng)
        query = _gen_query(rng)
        try:
            host = _run(provider, query, device=False)
            dev = _run(provider, query, device=True)
        except Exception as e:
            h = d = None
            try:
                host = _run(provider, query, device=False)
            except Exception as eh:
                h = str(eh)
            try:
                dev = _run(provider, query, device=True)
            except Exception as ed:
                d = str(ed)
            if h != d:
                print(f"FAIL(groupby) seed={s} q={query!r} host_err={h!r} dev_err={d!r}", flush=True)
                failures += 1
            continue
        if host != dev:
            print(f"FAIL(groupby) seed={s} q={query!r}", flush=True)
            failures += 1

        rngj = random.Random(s)
        providerj = _make_join_tables(rngj)
        qj = _gen_join_query(rngj)
        try:
            host = _run(providerj, qj, device=False)
            dev = _run(providerj, qj, device=True)
            if host != dev:
                print(f"FAIL(join) seed={s} q={qj!r}", flush=True)
                failures += 1
        except Exception as e:
            print(f"ERR(join) seed={s} q={qj!r} err={e!r}", flush=True)
            failures += 1
        rngo = random.Random(s)
        providero = _make_order_table(rngo)
        qo = _gen_order_query(rngo)
        try:
            host = _run(providero, qo, device=False)
            dev = _run(providero, qo, device=True)
            if host != dev:
                print(f"FAIL(order) seed={s} q={qo!r}", flush=True)
                failures += 1
        except Exception as e:
            print(f"ERR(order) seed={s} q={qo!r} err={e!r}", flush=True)
            failures += 1

        if (s - start + 1) % 50 == 0:
            print(f"...{s - start + 1}/{count} seeds done", flush=True)
    print(f"campaign done: {count} seeds, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
