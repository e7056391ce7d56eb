"""D2H staging probe for the async host-EMA path over the tunneled TPU.

Measures, for a ~256 MB packed buffer:
  * plain np.asarray(device_get) time  (baseline sync fetch)
  * device_put into pinned_host memory (the AsyncHostEMA staging path) +
    host read
  * copy_to_host_async + device_get    (fallback path)
and a per-leaf tree fetch for comparison (the pre-round-4 behavior whose
per-transfer latency made ref-scale offload take 55 s/step).

Usage: python scripts/d2h_probe.py [--mb 256] [--leaves 700]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--leaves", type=int, default=700)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = args.mb * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)
    x = jax.jit(lambda v: v * 1.0001)(x)
    np.asarray(x[:8])  # materialize

    t0 = time.time()
    _ = np.asarray(x)
    t_sync = time.time() - t0
    log(f"sync device_get {args.mb} MB: {t_sync:.2f}s "
        f"({args.mb / max(t_sync, 1e-9):.0f} MB/s)")

    try:
        s = jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                              memory_kind="pinned_host")
        t0 = time.time()
        h = jax.device_put(x, s)
        t_put = time.time() - t0
        t0 = time.time()
        _ = np.asarray(h)
        t_read = time.time() - t0
        log(f"pinned_host device_put: dispatch {t_put:.3f}s + host read "
            f"{t_read:.2f}s ({args.mb / max(t_put + t_read, 1e-9):.0f} MB/s)")
    except Exception as e:
        log(f"pinned_host unsupported: {type(e).__name__}: {e}")

    t0 = time.time()
    x.copy_to_host_async()
    t_async = time.time() - t0
    t0 = time.time()
    _ = np.asarray(x)
    log(f"copy_to_host_async dispatch {t_async:.3f}s + get "
        f"{time.time() - t0:.2f}s")

    # per-leaf tree fetch (the pathological path)
    per = max(n // args.leaves, 1)
    leaves = [x[i * per:(i + 1) * per] for i in range(min(args.leaves, 64))]
    leaves = jax.jit(lambda ls: [l * 1.0 for l in ls])(leaves)
    t0 = time.time()
    _ = jax.device_get(leaves)
    dt = time.time() - t0
    log(f"per-leaf device_get of {len(leaves)} x {per * 4 / 1e6:.1f} MB: "
        f"{dt:.2f}s -> est {dt / len(leaves) * args.leaves:.1f}s for "
        f"{args.leaves} leaves")


if __name__ == "__main__":
    main()
