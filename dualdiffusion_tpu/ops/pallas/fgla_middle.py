"""Pallas TPU kernel: fused FGLA middle INCLUDING the sublane DFT stages.

Extends ops/pallas/ola_reframe.py: besides window -> OLA -> envelope ->
reflect -> reframe -> window, this kernel also performs the two
Cooley-Tukey stages that contract the small (k1/t1) grid axis:

    Z1 (k1, t2) --conj twiddle--> . --IDFT_n1 (Re)--> y (t1, t2)
       --> [polyphase middle] --> y2 (t1, t2)
       --DFT_n1--> . --twiddle--> Z2 (k1, t2)

Why: XLA lowers a sublane-axis contraction by materializing a k1-major
relayout of the full (F, n1, n2) tensor — measured ~6 ms/iteration of
pure data movement at the flagship FGLA size, the dominant cost of the
digit-order loop. Here both stages are single MXU matmuls over a
VMEM-resident frame block with the real/imag halves stacked on the
contraction axis (K = 2*n1p), and the loop state outside is k1-MAJOR
(..., n1p, F, n2) so every remaining XLA stage is a lane-dim matmul or
elementwise — no relayouts anywhere in the iteration.

Layout notes: frame windows are sliced on the sublane-tiled F axis, so
the block size and halo must be multiples of 8 (asserted; hl = 24).
Bank/mirror machinery follows ola_reframe.py (parity row banks,
permutation-matmul reflect mirrors, statically-offset first/interior/
last branches), but frames arrive t1-major (n1s, tb, n2), which makes
every row slice a leading-dim index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ola_reframe import _flip_mats


def _pick_aligned_block(f: int, block_frames: int, hl: int, n1: int):
    """Largest divisor of f that is a sublane multiple, >= the halo and
    the edge-mirror span, and <= block_frames; None if none exists."""
    lo = max(hl, n1 // 2 + 2, 8)
    for cand in range(min(block_frames, f), lo - 1, -1):
        if f % cand == 0 and cand % 8 == 0:
            if f // cand <= 2 or cand >= hl:
                return cand
    return None


def fgla_middle_supported(f: int, n1: int, block_frames: int = 64) -> bool:
    hl0 = -(-((n1 - 1) // 2) // 8) * 8
    return _pick_aligned_block(f, block_frames, hl0, n1) is not None


def _fgla_middle_kernel(z1r_hbm, z1i_hbm, enve_hbm, envo_hbm, win_ref,
                        ctwr_ref, ctwi_ref, ftwr_ref, ftwi_ref,
                        gstack_ref, fstack_ref,
                        p1_ref, p0_ref, q1_ref, q0_ref, anti_ref,
                        z2r_ref, z2i_ref,
                        z_both, y2_ref, e_ref, o_ref, ee_ref, eo_ref,
                        sem_r, sem_i, sem_e, sem_o, *,
                        bf: int, hl: int, tb: int, f_total: int, n1: int,
                        n1s: int, n2: int, nb: int):
    bc_i = pl.program_id(0)
    ib = pl.program_id(1)
    p = n1 // 2
    rho = (n1 + 1) // 2

    # a0 expressed as (sublane blocks) * 8 so Mosaic can PROVE the F-axis
    # slice start divides the (8, 128) tiling (bf, hl, tb, f_total are all
    # multiples of 8 — asserted by the wrapper)
    a0 = jnp.clip(ib * (bf // 8) - hl // 8, 0, (f_total - tb) // 8) * 8
    cps = [
        pltpu.make_async_copy(z1r_hbm.at[bc_i, :, pl.ds(a0, tb)],
                              z_both.at[pl.ds(0, n1s)], sem_r),
        pltpu.make_async_copy(z1i_hbm.at[bc_i, :, pl.ds(a0, tb)],
                              z_both.at[pl.ds(n1s, n1s)], sem_i),
        pltpu.make_async_copy(enve_hbm.at[pl.ds(a0, tb + rho)], ee_ref,
                              sem_e),
        pltpu.make_async_copy(envo_hbm.at[pl.ds(a0, tb + rho)], eo_ref,
                              sem_o),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # ---- conj twiddle + inverse n1-stage: y = Re(IDFT_n1(ctw * Z1)) ------
    # the whole chain stays in the io dtype (bf16 in production): fp32
    # value intermediates at this block size overflow the VMEM stack
    wd = z_both.dtype
    zr = z_both[pl.ds(0, n1s)]                           # (n1s, tb, n2)
    zi = z_both[pl.ds(n1s, n1s)]
    ctr = ctwr_ref[...][:, None, :].astype(wd)           # (n1s, 1, n2)
    cti = ctwi_ref[...][:, None, :].astype(wd)
    tzr = zr * ctr - zi * cti
    tzi = zr * cti + zi * ctr
    zs = jnp.concatenate([tzr, tzi], axis=0)             # (2*n1s, tb, n2)
    # y[t1] = sum_k1 g1r[k1,t1] zr'[k1] + g1i[k1,t1] zi'[k1]
    y = jnp.dot(gstack_ref[...].astype(wd), zs.reshape(2 * n1s, tb * n2),
                preferred_element_type=jnp.float32).astype(wd)
    win = win_ref[...]                                   # (n1s, n2) f32
    yw = y.reshape(n1s, tb, n2) * win[:, None, :].astype(wd)

    # ---- overlap-add into parity row banks -------------------------------
    # frame j row r1 -> sig row 2*(a0+j) + r1: bank r1%2, index j + r1//2
    e_ref[...] = jnp.zeros_like(e_ref)
    o_ref[...] = jnp.zeros_like(o_ref)
    for q in range((n1 + 1) // 2):
        e_ref[pl.ds(q, tb)] += yw[2 * q].astype(jnp.float32)
        if 2 * q + 1 < n1:
            o_ref[pl.ds(q, tb)] += yw[2 * q + 1].astype(jnp.float32)
    e_ref[...] *= ee_ref[...].reshape(e_ref.shape)
    o_ref[...] *= eo_ref[...].reshape(o_ref.shape)

    # ---- re-frame into y2 (t1-major), edges mirrored ---------------------
    def emit(off: int):
        for r1 in range(n1):
            q, par = divmod(r1, 2)
            bank = e_ref if par == 0 else o_ref
            rows = bank[pl.ds(off + q, bf)]              # (bf, n2)
            y2_ref[r1] = (rows * win[r1]).astype(y2_ref.dtype)
        if n1s > n1:
            y2_ref[pl.ds(n1, n1s - n1)] = jnp.zeros((n1s - n1, bf, n2),
                                                    y2_ref.dtype)

    def left_mirror():
        ne = (p + 1) // 2
        no = p // 2
        anti = anti_ref[...]
        p1 = p1_ref[...]
        p0 = p0_ref[...]
        asz = anti.shape[0]

        def rev(count, sl):
            return jnp.dot(anti[asz - count:, :count], sl,
                           preferred_element_type=jnp.float32)

        a_ev = rev(ne, o_ref[pl.ds(p - ne, ne)])
        b_ev = rev(ne, e_ref[pl.ds(p - ne + 1, ne)])
        mirror_ev = (jnp.dot(a_ev, p1, preferred_element_type=jnp.float32)
                     + jnp.dot(b_ev, p0, preferred_element_type=jnp.float32))
        a_od = rev(no, e_ref[pl.ds(p - no, no)])
        b_od = rev(no, o_ref[pl.ds(p - no, no)])
        mirror_od = (jnp.dot(a_od, p1, preferred_element_type=jnp.float32)
                     + jnp.dot(b_od, p0, preferred_element_type=jnp.float32))
        for r1 in range(n1):
            for t in range((p - r1 + 1) // 2):
                s = 2 * t + r1
                if s >= p:
                    break
                m, par = divmod(s, 2)
                src = mirror_ev if par == 0 else mirror_od
                y2_ref[r1, t, :] = (src[m] * win[r1]).astype(y2_ref.dtype)

    def right_mirror():
        r_tot = 2 * (f_total - 1) + n1
        a0s = f_total - tb
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
        t0 = f_total - bf
        for r1 in range(n1):
            for t in range(bf - 1, -1, -1):
                s = 2 * (t0 + t) + r1
                r = s - (r_tot - p)
                if r < 0:
                    break
                m, par = divmod(r, 2)
                src = mirror_ev if par == 0 else mirror_od
                y2_ref[r1, t, :] = (src[m] * win[r1]).astype(y2_ref.dtype)

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

    # ---- forward n1-stage + twiddle: Z2 = tw * DFT_n1(y2) ----------------
    z2 = jnp.dot(fstack_ref[...].astype(y2_ref.dtype),
                 y2_ref[...].reshape(n1s, bf * n2),
                 preferred_element_type=jnp.float32)     # (2*n1s, bf*n2)
    z2 = z2.reshape(2 * n1s, bf, n2)
    z2r = z2[:n1s]
    z2i = z2[n1s:]
    ftr = ftwr_ref[...][:, None, :]
    fti = ftwi_ref[...][:, None, :]
    z2r_ref[0] = (z2r * ftr - z2i * fti).astype(z2r_ref.dtype)
    z2i_ref[0] = (z2r * fti + z2i * ftr).astype(z2i_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n1_true", "block_frames",
                                             "interpret"))
def fgla_middle(z1r: jnp.ndarray, z1i: jnp.ndarray, win_g: jnp.ndarray,
                inv_env: jnp.ndarray, ctw: tuple, ftw: tuple,
                g_stack: jnp.ndarray, f_stack: jnp.ndarray,
                n1_true: int = 0, block_frames: int = 64,
                interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    """Fused inverse-n1-stage + polyphase middle + forward-n1-stage.

    z1r/z1i: (..., n1s, F, n2) k1-major lane-stage outputs (after the XLA
    k2 contraction, BEFORE the conj twiddle). win_g: (n1s, n2).
    inv_env: ((F-1)*2 + n1_true, n2). ctw/ftw: (re, im) twiddle tables
    (n1s, n2) — conj W_n^{k1 t2} and W_n^{k1 t2}. g_stack: (n1s, 2*n1s)
    = [g1r; g1i]^T stacked on the contraction axis. f_stack: (2*n1s, n1s)
    = [f1r^T; f1i^T]. Returns (z2r, z2i) with the same shape/dtype as
    z1r — pad rows exactly zero.
    """
    *lead, n1s, f, n2 = z1r.shape
    n1 = n1_true or n1s
    assert n2 == 128 and n1 % 2 == 0 and n1s % 8 == 0
    bc = int(np.prod(lead)) if lead else 1
    z1rf = z1r.reshape(bc, n1s, f, n2)
    z1if = z1i.reshape(bc, n1s, f, n2)

    hl0 = -(-((n1 - 1) // 2) // 8) * 8        # halo rounded up to sublanes
    bf = _pick_aligned_block(f, block_frames, hl0, n1)
    assert bf is not None, (f, n1, block_frames)
    nb = f // bf
    hl = hl0 if nb > 1 else 0
    assert nb <= 2 or bf >= hl
    tb = min(bf + 2 * hl, f)
    assert bf % 8 == 0 and hl % 8 == 0 and tb % 8 == 0 and f % 8 == 0
    rho = (n1 + 1) // 2

    p1, p0, q1, q0 = _flip_mats(n2)
    anti = np.eye(max(rho + 1, 8), dtype=np.float32)[::-1].copy()
    inv_env = inv_env.astype(jnp.float32)
    env_e = inv_env[0::2]
    env_o = inv_env[1::2]
    need = f + rho
    env_e = jnp.pad(env_e, ((0, max(0, need - env_e.shape[0])), (0, 0)))
    env_o = jnp.pad(env_o, ((0, max(0, need - env_o.shape[0])), (0, 0)))
    env_e = env_e[:, None, :]
    env_o = env_o[:, None, :]

    kernel = functools.partial(
        _fgla_middle_kernel, bf=bf, hl=hl, tb=tb, f_total=f, n1=n1,
        n1s=n1s, n2=n2, nb=nb)

    const = lambda shape: pl.BlockSpec(shape, lambda bc_, ib: tuple(
        0 for _ in shape))
    out = pl.pallas_call(
        kernel,
        grid=(bc, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # z1r
            pl.BlockSpec(memory_space=pl.ANY),   # z1i
            pl.BlockSpec(memory_space=pl.ANY),   # env even
            pl.BlockSpec(memory_space=pl.ANY),   # env odd
            const((n1s, n2)),                       # window
            const((n1s, n2)), const((n1s, n2)),     # conj twiddle re/im
            const((n1s, n2)), const((n1s, n2)),     # fwd twiddle re/im
            const((n1s, 2 * n1s)),                  # g_stack
            const((2 * n1s, n1s)),                  # f_stack
            const((n2, n2)), const((n2, n2)),       # P1, P0
            const((n2, n2)), const((n2, n2)),       # Q1, Q0
            const(anti.shape),                      # anti
        ],
        out_specs=[
            pl.BlockSpec((1, n1s, bf, n2), lambda bc_, ib: (bc_, 0, ib, 0)),
            pl.BlockSpec((1, n1s, bf, n2), lambda bc_, ib: (bc_, 0, ib, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bc, n1s, f, n2), z1r.dtype),
            jax.ShapeDtypeStruct((bc, n1s, f, n2), z1r.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * n1s, tb, n2), z1r.dtype),     # z_both
            pltpu.VMEM((n1s, bf, n2), z1r.dtype),         # y2
            pltpu.VMEM((tb + rho, n2), jnp.float32),      # even bank
            pltpu.VMEM((tb + rho, n2), jnp.float32),      # odd bank
            pltpu.VMEM((tb + rho, 1, n2), jnp.float32),   # env even
            pltpu.VMEM((tb + rho, 1, n2), jnp.float32),   # env odd
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z1rf, z1if, env_e, env_o, jnp.asarray(win_g, jnp.float32),
      jnp.asarray(ctw[0], jnp.float32), jnp.asarray(ctw[1], jnp.float32),
      jnp.asarray(ftw[0], jnp.float32), jnp.asarray(ftw[1], jnp.float32),
      jnp.asarray(g_stack, jnp.float32), jnp.asarray(f_stack, jnp.float32),
      jnp.asarray(p1), jnp.asarray(p0), jnp.asarray(q1), jnp.asarray(q0),
      jnp.asarray(anti))
    return out[0].reshape(z1r.shape), out[1].reshape(z1r.shape)
