"""FGLA loop-variant probe at the flagship geometry (6400-pt hann^32,
hop 256, 5504 frames = the 45 s clip).

Measures wall-clock and spectral convergence for:
  * two-kernel loop (fuse_transforms, ops/pallas/{fgla_middle,fgla_spectral})
  * single-kernel loop (fuse_iteration, ops/pallas/fgla_iter) — the r-state
    carry variant whose TPU speed decides the production default
  * SPSI phase init at reduced iteration counts (equal-convergence check)

Usage: python scripts/fgla_probe.py [--frames 5504] [--iters 200]
Prints one JSON line with {variant: {seconds, conv_err}}.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5504)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.ops import get_window, stft
    from dualdiffusion_tpu.ops.fgla_fast import griffinlim_fast

    n_fft, hop = 6400, 256
    win = get_window("hann_power", n_fft, exponent=32.0)
    rng = np.random.default_rng(0)
    t = np.arange((args.frames - 1) * hop) / 32000
    sig = sum(0.2 * np.sin(2 * np.pi * f * t * (1 + 0.001 * np.sin(2 * np.pi * 2 * t)))
              for f in (220.0, 330.0, 440.0, 880.0))
    sig = sig + 0.1 * np.sin(2 * np.pi * (200 + 40 * t) * t)
    sig = sig + 0.02 * rng.standard_normal(sig.shape)
    audio = jnp.asarray(np.stack([sig, sig * 0.8]).astype(np.float32)[None])
    target_f = jax.jit(lambda a: jnp.abs(stft(a, win, n_fft, hop)))
    target = jnp.asarray(np.asarray(target_f(audio))[:, :, :args.frames])
    log(f"target {target.shape}")

    def conv_err(out):
        got = target_f(out)
        f2 = min(got.shape[2], target.shape[2])
        return float(jnp.linalg.norm(got[:, :, :f2] - target[:, :, :f2])
                     / jnp.linalg.norm(target))

    variants = {
        "two_kernel": dict(fuse_transforms=True, fuse_iteration=False,
                           n_iter=args.iters),
        "fused_iter": dict(fuse_iteration=True, n_iter=args.iters),
        "fused_iter_spsi150": dict(fuse_iteration=True, phase_init="spsi",
                                   n_iter=args.iters * 3 // 4),
        # phase-locked SPSI at HALF the iterations beats flat@200 on
        # mel-inverted magnitudes (tests/test_fgla_fast.py); this probe's
        # exact-STFT target is the conservative case
        "fused_iter_spsi100": dict(fuse_iteration=True, phase_init="spsi",
                                   n_iter=args.iters // 2),
        "fused_iter_spsi": dict(fuse_iteration=True, phase_init="spsi",
                                n_iter=args.iters),
    }
    results = {}
    for name, kw in variants.items():
        fg = jax.jit(lambda m: griffinlim_fast(
            m, win, n_fft, hop, momentum=0.99, stereo=True,
            stereo_coherence=0.67, work_dtype="bfloat16", **kw))
        t0 = time.time()
        out = np.asarray(fg(target))
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(args.reps):
            out = np.asarray(fg(target))
        dt = (time.time() - t0) / args.reps
        err = conv_err(jnp.asarray(out))
        results[name] = {"seconds": round(dt, 3), "conv_err": round(err, 5)}
        log(f"{name}: {dt:.2f}s, conv_err {err:.4f}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
