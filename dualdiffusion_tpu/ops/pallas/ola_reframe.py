"""Pallas TPU kernel: fused FGLA middle on the polyphase row grid.

Computes, in ONE pass over the frames (everything else in VMEM):

    frames -> *window -> overlap-add -> *1/envelope -> center-crop
           -> reflect-pad -> re-frame -> *window -> frames

i.e. the time-domain section of one Griffin-Lim iteration
(reference composition: src/modules/formats/old/phase_recovery.py:103-116
= istft's OLA/envelope + stft's pad/frame). The XLA lowering of this
section materialized ~25 full-size (70 MB) frame intermediates per
iteration in a layout the DFT matmuls then had to copy out of; here the
signal rows never leave VMEM.

Layout: frames are (..., F, n1, n2) polyphase rows (time t = t1*n2 + t2,
see ops/fgla_fast.py), hop = 2 rows (hop_rows == 2). Overlap-added signal
rows are held as separate even/odd row banks (fp32) so row parity never
needs interleaving — frame t's row r1 lands on signal row 2t + r1, which
is bank r1%2, index t + r1//2.

Mosaic constraints shaping the code:
  * no lane/sublane reverse -> all reflection mirrors are matmuls with
    constant permutation matrices (anti-identity on the row axis, lane
    shift-flips P1/P0 and Q1/Q0 on the sample axis);
  * dynamic slice starts on the minor (sublane) dim must be static -> the
    grid requires F % block == 0 and first/interior/last blocks are three
    statically-offset branches under pl.when;
  * frame windows (with halo) and envelope banks are fetched with manual
    async copies from ANY-space refs, since their clamped offsets can't be
    expressed as BlockSpec index maps.

The jnp reference implementation is ops/fgla_fast.py::ola_reframe_jnp;
tests check fp32 agreement in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flip_mats(n2: int):
    """Constant lane permutation matrices for torch-reflect mirrors.

    P1: lane t2 (>=1) -> lane n2 - t2, lane 0 zeroed.  P0: lane 0 -> lane
    0 only.  Q1: lane t2 (<= n2-2) -> lane n2-2-t2, last lane zeroed.
    Q0: lane n2-1 -> lane n2-1 only.  (Right-multiplication: out = row @ M
    with M[src, dst].)
    """
    p1 = np.zeros((n2, n2), np.float32)
    for t2 in range(1, n2):
        p1[t2, n2 - t2] = 1.0
    p0 = np.zeros((n2, n2), np.float32)
    p0[0, 0] = 1.0
    q1 = np.zeros((n2, n2), np.float32)
    for t2 in range(0, n2 - 1):
        q1[t2, n2 - 2 - t2] = 1.0
    q0 = np.zeros((n2, n2), np.float32)
    q0[n2 - 1, n2 - 1] = 1.0
    return p1, p0, q1, q0


def _ola_reframe_kernel(y_hbm, enve_hbm, envo_hbm, win_ref, p1_ref, p0_ref,
                        q1_ref, q0_ref, anti_ref, out_ref,
                        y_vmem, ee_ref, eo_ref, e_ref, o_ref,
                        sem_y, sem_e, sem_o, *,
                        bf: int, hl: int, tb: int, f_total: int, n1: int,
                        n1s: int, n2: int, nb: int):
    """One (bc, ib) grid step: emit output frames [ib*bf, (ib+1)*bf)."""
    bc_i = pl.program_id(0)
    ib = pl.program_id(1)
    p = n1 // 2                    # crop/pad rows (n_fft//2 samples)
    rho = (n1 + 1) // 2            # extra parity-bank rows

    # ---- DMA frames [a0, a0 + tb) and matching envelope bank rows --------
    a0 = jnp.clip(ib * bf - hl, 0, f_total - tb)
    cps = [pltpu.make_async_copy(y_hbm.at[bc_i, pl.ds(a0, tb)], y_vmem, sem_y),
           pltpu.make_async_copy(enve_hbm.at[pl.ds(a0, tb + rho)], ee_ref,
                                 sem_e),
           pltpu.make_async_copy(envo_hbm.at[pl.ds(a0, tb + rho)], eo_ref,
                                 sem_o)]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    win = win_ref[...]                                # (n1, n2) f32
    yw = y_vmem[...].astype(jnp.float32) * win[None]  # (tb, n1, n2)

    # ---- overlap-add into parity banks -----------------------------------
    # local frame j row r1 -> sig row 2*(a0+j) + r1:
    #   r1 = 2*q   -> even bank index j + q (global even-row a0 + j + q)
    #   r1 = 2*q+1 -> odd bank index j + q
    e_ref[...] = jnp.zeros_like(e_ref)
    o_ref[...] = jnp.zeros_like(o_ref)
    for q in range((n1 + 1) // 2):
        e_ref[pl.ds(q, tb)] += yw[:, 2 * q, :]
        if 2 * q + 1 < n1:
            o_ref[pl.ds(q, tb)] += yw[:, 2 * q + 1, :]

    # ---- envelope division (bank index u <-> global parity row u + a0) ---
    e_ref[...] *= ee_ref[...].reshape(e_ref.shape)
    o_ref[...] *= eo_ref[...].reshape(o_ref.shape)

    # ---- re-frame: out[t, r1] = padded_row[2*(t0+t) + r1] * win[r1] ------
    # padded rows coincide with sig rows except the first/last p rows
    # (torch reflect of the core), overwritten below for edge blocks.
    def emit(off: int):
        for r1 in range(n1):
            q, par = divmod(r1, 2)
            bank = e_ref if par == 0 else o_ref
            rows = bank[pl.ds(off + q, bf)]           # (bf, n2)
            out_ref[0, :, r1, :] = (rows * win[r1]).astype(out_ref.dtype)
        if n1s > n1:
            # storage pad rows must be ZERO (NaN garbage would leak
            # through the 0-basis rows of the digit-DFT as NaN*0)
            out_ref[0, :, n1:, :] = jnp.zeros((bf, n1s - n1, n2),
                                              out_ref.dtype)

    def left_mirror():
        # pad row s (< p): [t2>=1] = core_row[p-1-s][n2-t2], [0] =
        # core_row[p-s][0]; core_row c = sig row c + p. Even pad rows
        # source the bank of parity (s+1)%2 == odd-for-even-s.
        ne = (p + 1) // 2
        no = p // 2
        anti = anti_ref[...]
        p1 = p1_ref[...]
        p0 = p0_ref[...]

        asz = anti.shape[0]

        def rev(count, sl):
            # anti-identity of size `count` = bottom-left corner of anti
            return jnp.dot(anti[asz - count:, :count], sl,
                           preferred_element_type=jnp.float32)

        # even s = 2m: main sig row 2p-1-2m (odd bank, idx p-1-m),
        # lane-0 companion sig row 2p-2m (even bank, idx p-m)
        a_ev = rev(ne, o_ref[pl.ds(p - ne, ne)])
        b_ev = rev(ne, e_ref[pl.ds(p - ne + 1, ne)])
        mirror_ev = (jnp.dot(a_ev, p1, preferred_element_type=jnp.float32)
                     + jnp.dot(b_ev, p0, preferred_element_type=jnp.float32))
        # odd s = 2m+1: main sig row 2p-2-2m (even bank, idx p-1-m),
        # companion sig row 2p-1-2m (odd bank, idx p-1-m)
        a_od = rev(no, e_ref[pl.ds(p - no, no)])
        b_od = rev(no, o_ref[pl.ds(p - no, no)])
        mirror_od = (jnp.dot(a_od, p1, preferred_element_type=jnp.float32)
                     + jnp.dot(b_od, p0, preferred_element_type=jnp.float32))
        win_l = win_ref[...]
        for r1 in range(n1):
            for t in range((p - r1 + 1) // 2):
                s = 2 * t + r1
                if s >= p:
                    break
                m, par = divmod(s, 2)
                src = mirror_ev if par == 0 else mirror_od
                out_ref[0, t, r1, :] = (src[m] * win_l[r1]).astype(
                    out_ref.dtype)

    def right_mirror():
        # pad row r (s = R-p+r): [t2<=n2-2] = core_row[Rc-1-r][n2-2-t2],
        # [n2-1] = core_row[Rc-2-r][n2-1]; R = 2*(F-1)+n1 padded rows.
        r_tot = 2 * (f_total - 1) + n1
        a0s = f_total - tb                           # static last-block a0
        ne = (p + 1) // 2
        no = p // 2
        anti = anti_ref[...]
        q1 = q1_ref[...]
        q0 = q0_ref[...]
        par_a = (r_tot - p - 1) % 2
        banks = (e_ref, o_ref)

        asz = anti.shape[0]

        def tail(bank, count, last_global):
            u_last = last_global // 2 - a0s
            sl = bank[pl.ds(u_last - count + 1, count)]
            return jnp.dot(anti[asz - count:, :count], sl,
                           preferred_element_type=jnp.float32)

        a_ev = tail(banks[par_a], ne, r_tot - p - 1)
        b_ev = tail(banks[1 - par_a], ne, r_tot - p - 2)
        mirror_ev = (jnp.dot(a_ev, q1, preferred_element_type=jnp.float32)
                     + jnp.dot(b_ev, q0, preferred_element_type=jnp.float32))
        a_od = tail(banks[1 - par_a], no, r_tot - p - 2)
        b_od = tail(banks[par_a], no, r_tot - p - 3)
        mirror_od = (jnp.dot(a_od, q1, preferred_element_type=jnp.float32)
                     + jnp.dot(b_od, q0, preferred_element_type=jnp.float32))
        win_l = win_ref[...]
        t0 = f_total - bf
        for r1 in range(n1):
            for t in range(bf - 1, -1, -1):
                s = 2 * (t0 + t) + r1
                r = s - (r_tot - p)
                if r < 0:
                    break
                m, par = divmod(r, 2)
                src = mirror_ev if par == 0 else mirror_od
                out_ref[0, t, r1, :] = (src[m] * win_l[r1]).astype(
                    out_ref.dtype)

    if nb == 1:
        emit(0)
        left_mirror()
        right_mirror()
    else:
        @pl.when(ib == 0)
        def _first():
            emit(0)
            left_mirror()

        @pl.when((ib > 0) & (ib < nb - 1))
        def _interior():
            emit(hl)

        @pl.when(ib == nb - 1)
        def _last():
            emit(tb - bf)
            right_mirror()


def ola_reframe_supported(f: int, n1: int,
                          block_frames: int = 172) -> bool:
    """True iff ola_reframe's kernel preconditions hold — mirrors every
    assert in ola_reframe so dispatchers can fall back cleanly instead of
    tripping an AssertionError inside the Pallas path."""
    if n1 < 2 or n1 % 2 != 0:
        return False
    hl = (n1 - 1) // 2
    bf = _pick_block(f, block_frames, hl)
    nb = f // bf
    return bf >= n1 // 2 + 2 and (nb <= 2 or bf >= hl)


def _pick_block(f: int, block_frames: int, hl: int = 0) -> int:
    bf = min(block_frames, f)
    while f % bf != 0:
        bf -= 1
    if f // bf > 2 and bf < hl:
        # interior blocks need a one-sided halo within the previous block
        for cand in range(min(block_frames, f), hl - 1, -1):
            if f % cand == 0:
                return cand
    return bf


@functools.partial(jax.jit, static_argnames=("n1_true", "hop_rows",
                                             "block_frames", "interpret"))
def ola_reframe(y: jnp.ndarray, win_g: jnp.ndarray, inv_env: jnp.ndarray,
                n1_true: int = 0, hop_rows: int = 2,
                block_frames: int = 172,
                interpret: bool = False) -> jnp.ndarray:
    """Fused FGLA middle. y: (..., F, n1s, n2) where n1s is the (possibly
    sublane-padded) storage row count and ``n1_true`` (default n1s) the
    real frame rows; win_g: (n1s, n2); inv_env: ((F-1)*hop_rows + n1_true,
    n2). Returns same shape as y with zeroed pad rows. fp32-exact match of
    ola_reframe_jnp on the true rows."""
    assert hop_rows == 2, "kernel is specialized to hop = 2 rows"
    *lead, f, n1s, n2 = y.shape
    n1 = n1_true or n1s
    assert n2 == 128 and n1 % 2 == 0 and n1s % 8 == 0 and n1s >= n1
    bc = int(np.prod(lead)) if lead else 1
    yf = y.reshape(bc, f, n1s, n2)

    hl0 = (n1 - 1) // 2
    bf = _pick_block(f, block_frames, hl0)
    assert bf >= n1 // 2 + 2, f"block of {bf} frames too small for edges"
    nb = f // bf
    hl = hl0 if nb > 1 else 0
    assert nb <= 2 or bf >= hl
    tb = min(bf + 2 * hl, f)
    rho = (n1 + 1) // 2

    p1, p0, q1, q0 = _flip_mats(n2)
    anti = np.eye(max(rho + 1, 8), dtype=np.float32)[::-1].copy()
    inv_env = inv_env.astype(jnp.float32)
    env_e = inv_env[0::2]                 # even sig rows ((r_tot+1)//2, n2)
    env_o = inv_env[1::2]
    # pad so any ds(a0, tb + rho) stays in range; 3-D so the DMA slices an
    # untiled leading dim
    need = f + rho                        # max a0 + window
    env_e = jnp.pad(env_e, ((0, max(0, need - env_e.shape[0])), (0, 0)))
    env_o = jnp.pad(env_o, ((0, max(0, need - env_o.shape[0])), (0, 0)))
    env_e = env_e[:, None, :]
    env_o = env_o[:, None, :]

    kernel = functools.partial(
        _ola_reframe_kernel, bf=bf, hl=hl, tb=tb, f_total=f, n1=n1,
        n1s=n1s, n2=n2, nb=nb)

    out = pl.pallas_call(
        kernel,
        grid=(bc, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # frames (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),     # env even bank
            pl.BlockSpec(memory_space=pl.ANY),     # env odd bank
            pl.BlockSpec((n1s, n2), lambda bc_, ib: (0, 0)),
            pl.BlockSpec((n2, n2), lambda bc_, ib: (0, 0)),
            pl.BlockSpec((n2, n2), lambda bc_, ib: (0, 0)),
            pl.BlockSpec((n2, n2), lambda bc_, ib: (0, 0)),
            pl.BlockSpec((n2, n2), lambda bc_, ib: (0, 0)),
            pl.BlockSpec(anti.shape, lambda bc_, ib: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bf, n1s, n2),
                               lambda bc_, ib: (bc_, ib, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bc, f, n1s, n2), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((tb, n1s, n2), y.dtype),
            pltpu.VMEM((tb + rho, 1, n2), jnp.float32),
            pltpu.VMEM((tb + rho, 1, n2), jnp.float32),
            pltpu.VMEM((tb + rho, n2), jnp.float32),
            pltpu.VMEM((tb + rho, n2), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(yf, env_e, env_o, jnp.asarray(win_g, jnp.float32),
      jnp.asarray(p1), jnp.asarray(p0), jnp.asarray(q1), jnp.asarray(q0),
      jnp.asarray(anti))
    return out.reshape(y.shape)
