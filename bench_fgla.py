"""FGLA optimization bench: precision modes of the matmul-DFT backend.

Measures wall-clock and spectral-convergence quality (|STFT(recon)| vs the
target magnitudes) for each MXU precision on the flagship 45 s workload.
"""

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--width", type=int, default=5504)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.ops import fft as ddfft
    from dualdiffusion_tpu.ops import griffinlim, stft, get_window

    n_fft, hop = 6400, 256
    win = get_window("hann_power", n_fft, exponent=32.0)
    key = jax.random.PRNGKey(0)

    # a real-ish target: magnitudes of an actual waveform so convergence is
    # measurable
    t = np.arange((args.width - 1) * hop) / 32000
    sig = sum(0.2 * np.sin(2 * np.pi * f * t * (1 + 0.001 * np.sin(2 * np.pi * 2 * t)))
              for f in (220.0, 330.0, 440.0, 880.0))
    audio = jnp.asarray(np.stack([sig, sig * 0.8]).astype(np.float32)[None])
    log(f"audio {audio.shape}")

    target_f = jax.jit(lambda a: jnp.abs(stft(a, win, n_fft, hop)))
    target = jax.block_until_ready(target_f(audio))
    log(f"target magnitudes {target.shape}")

    results = {}
    modes = [("highest", "float32"), ("default", "float32"),
             ("default", "bfloat16")]
    for prec, wd in modes:
        ddfft.set_matmul_precision(prec)
        fg = jax.jit(lambda m, k: griffinlim(m, win, n_fft, hop,
                                             n_iter=args.iters, momentum=0.99,
                                             stereo=True, stereo_coherence=0.67,
                                             key=k, work_dtype=wd))
        out = jax.block_until_ready(fg(target, key))  # compile
        t0 = time.time()
        out = jax.block_until_ready(fg(target, key))
        dt = time.time() - t0
        got = jax.block_until_ready(target_f(out))
        err = float(jnp.linalg.norm(got - target) / jnp.linalg.norm(target))
        results[f"{prec}/{wd}"] = (dt, err)
        log(f"precision={prec} work={wd}: {dt:.2f} s, "
            f"spectral convergence err {err:.4f}")
    ddfft.set_matmul_precision("highest")

    import json
    print(json.dumps({k: {"seconds": round(v[0], 3), "err": round(v[1], 5)}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
