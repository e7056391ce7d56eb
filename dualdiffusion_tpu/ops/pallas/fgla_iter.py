"""Pallas TPU kernel: ONE fused Griffin-Lim iteration per pallas_call.

Supersedes the fgla_middle + fgla_spectral pair (which round-trip the
lane-stage state through HBM and re-read the z1 block with a 1.4-2x halo
every iteration). Rewritten around two measured bottlenecks of the
two-kernel loop at the flagship size (8.4 ms/iter vs a 2.7 ms traffic
roofline):

  * the manual halo DMA + per-block overhead alone cost 3.5 ms/iter
    (ablation: a DMA-only kernel), and
  * the spectral kernel spilled ~MBs of fp32 intermediates to scoped
    VMEM (register-allocator spill slots) because the whole
    (n1s, bf, n2) block was computed as one live value chain.

Design:

  * **r-state carry.** The loop state in HBM is just the raw forward
    spectra of the last two iterations (r_k, r_{k-1}) plus the constant
    target magnitudes — 8 full-array reads/writes per iteration instead
    of 14. Iteration k derives its input INSIDE the kernel:
    n = r_k - mom*r_{k-1}; ang = n*rsqrt(|n|^2); x = ang*interp(t_k);
    then inverse lane stage -> conj twiddle -> inverse sublane stage ->
    polyphase middle -> forward sublane stage -> twiddle -> forward lane
    stage -> r_{k+1}. (Same math as ops/fgla_fast.py's _loop_fused,
    reference semantics: src/modules/formats/old/phase_recovery.py:39-129.)
  * **No halo: pipelined OLA with one-block-delayed emission.** The only
    cross-frame coupling (overlap-add + re-framing, hop = 2 signal rows)
    is carried across sequential grid steps in VMEM parity row banks:
    grid step j overlap-adds block j's frames into a current bank and
    emits the *previous* block's frames (complete once block j's
    contributions landed — the OLA overhang spans rho = ceil(n1/2) < bf
    rows). Every input block is therefore read exactly once per
    iteration, through plain BlockSpec windows that Mosaic double-buffers
    and overlaps with compute — no manual full-block DMA at all.
  * **Grouped value chains.** All lane-stage matmuls + elementwise run
    per 8-sublane-row group so fp32 intermediates stay register-sized.

Geometry contract (asserted): n2 = 128 lanes, hop = 2 rows (256
samples), n1 = n_fft/128 even, F % bf == 0, bf % 8 == 0, bf >= 56.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ola_reframe import _flip_mats

_OVER = 32          # bank overhang rows kept across grid steps (>= rho+1)


def fgla_iter_supported(f: int, n1: int, block_frames: int = 128) -> bool:
    return _pick_block(f, n1, block_frames) is not None


def _pick_block(f: int, n1: int, block_frames: int):
    """Largest divisor of f that is a sublane multiple and spans the OLA
    overhang + mirror width; falls back to the smallest workable divisor
    above ``block_frames`` (VMEM permitting) when f is divisor-poor."""
    lo = max(n1 // 2 + 2, _OVER, 8)
    for cand in range(min(block_frames, f), lo - 1, -1):
        if f % cand == 0 and cand % 8 == 0:
            return cand
    for cand in range(block_frames + 1, min(f, 4 * block_frames) + 1):
        if f % cand == 0 and cand % 8 == 0:
            return cand
    return None


def _kernel(t_ref, rkr_ref, rki_ref, rpr_ref, rpi_ref, sp_ref, mg_ref,
            enve_hbm, envo_hbm,
            win_ref, ctwr_ref, ctwi_ref, ftwr_ref, ftwi_ref,
            gstack_ref, fstack_ref, gr_ref, gi_ref, mr_ref, mi_ref,
            p1_ref, p0_ref, q1_ref, q0_ref, anti_ref,
            rr_ref, ri_ref,
            z_both, y2_ref, cur_e, cur_o, prev_e, prev_o, emit_e, emit_o,
            ee_ref, eo_ref, sem_e, sem_o, *,
            mom: float, bf: int, f_total: int, n1: int, n1s: int, n2: int,
            nb: int, use_spec: bool):
    j = pl.program_id(1)
    p = n1 // 2
    rho = (n1 + 1) // 2
    wd = rkr_ref.dtype
    ng = n1s // 8

    # ---- env DMA for the emission region (small, idx (j-1)*bf ..) -------
    a0 = jnp.maximum(j - 1, 0) * bf
    cp_e = pltpu.make_async_copy(enve_hbm.at[pl.ds(a0, bf + _OVER)], ee_ref,
                                 sem_e)
    cp_o = pltpu.make_async_copy(envo_hbm.at[pl.ds(a0, bf + _OVER)], eo_ref,
                                 sem_o)
    cp_e.start()
    cp_o.start()

    # ---- bank rotation: prev <- cur, cur <- overhang carry --------------
    @pl.when(j > 0)
    def _rotate():
        prev_e[...] = cur_e[...]
        prev_o[...] = cur_o[...]
    cur_head_e = jnp.zeros((bf + _OVER, n2), jnp.float32)
    cur_head_o = jnp.zeros((bf + _OVER, n2), jnp.float32)

    @pl.when(j > 0)
    def _carry():
        cur_e[...] = jnp.concatenate(
            [prev_e[pl.ds(bf, _OVER)], jnp.zeros((bf, n2), jnp.float32)], 0)
        cur_o[...] = jnp.concatenate(
            [prev_o[pl.ds(bf, _OVER)], jnp.zeros((bf, n2), jnp.float32)], 0)

    @pl.when(j == 0)
    def _zero():
        cur_e[...] = cur_head_e
        cur_o[...] = cur_head_o

    # ---- phase 1 (j < nb): derive x_k, run it down to OLA'd frames ------
    @pl.when(j < nb)
    def _forward_into_banks():
        momc = jnp.asarray(mom, jnp.float32)
        t = t_ref[0, 0]
        win = win_ref[...]
        for g in range(ng):
            r0 = g * 8
            nr = (rkr_ref[0, pl.ds(r0, 8)].astype(jnp.float32)
                  - momc * rpr_ref[0, pl.ds(r0, 8)].astype(jnp.float32))
            ni = (rki_ref[0, pl.ds(r0, 8)].astype(jnp.float32)
                  - momc * rpi_ref[0, pl.ds(r0, 8)].astype(jnp.float32))
            inv = jax.lax.rsqrt(nr * nr + ni * ni + 1e-20)
            mg = mg_ref[0, pl.ds(r0, 8)].astype(jnp.float32)
            if use_spec:
                sp = sp_ref[0, pl.ds(r0, 8)].astype(jnp.float32)
                interp = mg + (sp - mg) * jnp.maximum(t, 0.0)
            else:
                interp = mg
            scale = inv * interp
            xr = (nr * scale).astype(wd).reshape(8 * bf, n2)
            xi = (ni * scale).astype(wd).reshape(8 * bf, n2)
            # inverse lane stage: u = x @ (Gr + i Gi)
            gr = gr_ref[...].astype(wd)
            gi = gi_ref[...].astype(wd)
            ur = (jnp.dot(xr, gr, preferred_element_type=jnp.float32)
                  - jnp.dot(xi, gi, preferred_element_type=jnp.float32))
            ui = (jnp.dot(xr, gi, preferred_element_type=jnp.float32)
                  + jnp.dot(xi, gr, preferred_element_type=jnp.float32))
            ur = ur.reshape(8, bf, n2)
            ui = ui.reshape(8, bf, n2)
            # conj twiddle rows for this k1 group
            ctr = ctwr_ref[pl.ds(r0, 8)][:, None, :]
            cti = ctwi_ref[pl.ds(r0, 8)][:, None, :]
            z_both[pl.ds(r0, 8)] = (ur * ctr - ui * cti).astype(wd)
            z_both[pl.ds(n1s + r0, 8)] = (ur * cti + ui * ctr).astype(wd)
        # inverse sublane stage: y[t1] = Re(IDFT_n1) via stacked bases.
        # Staged through y2_ref (phase 2 rebuilds it from the banks) so
        # the (n1s, bf*n2) fp32 dot output never lives in registers.
        y = jnp.dot(gstack_ref[...].astype(wd),
                    z_both[...].reshape(2 * n1s, bf * n2),
                    preferred_element_type=jnp.float32)
        y2_ref[...] = (y.reshape(n1s, bf, n2)
                       * win[:, None, :]).astype(y2_ref.dtype)
        # overlap-add: frame tt row r1 -> sig row 2*(j*bf + tt) + r1,
        # i.e. parity bank r1 % 2 at local even/odd idx tt + r1 // 2 --
        # on top of the carry rows already holding the previous block's
        # contributions to idx [j*bf, j*bf+_OVER)
        for q in range((n1 + 1) // 2):
            cur_e[pl.ds(q, bf)] += y2_ref[2 * q].astype(jnp.float32)
            if 2 * q + 1 < n1:
                cur_o[pl.ds(q, bf)] += y2_ref[2 * q + 1].astype(jnp.float32)

    cp_e.wait()
    cp_o.wait()

    # ---- phase 2 (j > 0): emit block j-1, fwd transform, write r_{k+1} --
    @pl.when(j > 0)
    def _emit_and_forward():
        win = win_ref[...]
        # envelope over the complete region [ (j-1)bf, j*bf + _OVER )
        emit_e[...] = jnp.concatenate(
            [prev_e[pl.ds(0, bf)], cur_e[pl.ds(0, _OVER)]], 0) \
            * ee_ref[...].reshape(bf + _OVER, n2)
        emit_o[...] = jnp.concatenate(
            [prev_o[pl.ds(0, bf)], cur_o[pl.ds(0, _OVER)]], 0) \
            * eo_ref[...].reshape(bf + _OVER, n2)

        # re-frame: frame tt (local in block j-1) row r1 = sig row
        # 2*tt + r1 -> bank r1 % 2, local even/odd idx tt + r1 // 2
        for r1 in range(n1):
            q, par = divmod(r1, 2)
            bank = emit_e if par == 0 else emit_o
            y2_ref[r1] = (bank[pl.ds(q, bf)] * win[r1]).astype(y2_ref.dtype)
        if n1s > n1:
            y2_ref[pl.ds(n1, n1s - n1)] = jnp.zeros((n1s - n1, bf, n2),
                                                    y2_ref.dtype)

        # torch-style reflect padding at the clip edges (crop p rows each
        # side + mirror), expressed as overwrites of the edge frames
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

            a_ev = rev(ne, emit_o[pl.ds(p - ne, ne)])
            b_ev = rev(ne, emit_e[pl.ds(p - ne + 1, ne)])
            mirror_ev = (jnp.dot(a_ev, p1, preferred_element_type=jnp.float32)
                         + jnp.dot(b_ev, p0,
                                   preferred_element_type=jnp.float32))
            a_od = rev(no, emit_e[pl.ds(p - no, no)])
            b_od = rev(no, emit_o[pl.ds(p - no, no)])
            mirror_od = (jnp.dot(a_od, p1, preferred_element_type=jnp.float32)
                         + jnp.dot(b_od, p0,
                                   preferred_element_type=jnp.float32))
            for r1 in range(n1):
                for tt in range((p - r1 + 1) // 2):
                    s = 2 * tt + r1
                    if s >= p:
                        break
                    m, par = divmod(s, 2)
                    src = mirror_ev if par == 0 else mirror_od
                    y2_ref[r1, tt, :] = (src[m] * win[r1]).astype(
                        y2_ref.dtype)

        def right_mirror():
            r_tot = 2 * (f_total - 1) + n1
            ne = (p + 1) // 2
            no = p // 2
            anti = anti_ref[...]
            q1 = q1_ref[...]
            q0 = q0_ref[...]
            par_a = (r_tot - p - 1) % 2
            banks = (emit_e, emit_o)
            asz = anti.shape[0]
            base = (nb - 1) * bf          # global even/odd idx of emit[0]

            def tail(bank, count, last_global):
                u_last = last_global // 2 - base
                sl = bank[pl.ds(u_last - count + 1, count)]
                return jnp.dot(anti[asz - count:, :count], sl,
                               preferred_element_type=jnp.float32)

            a_ev = tail(banks[par_a], ne, r_tot - p - 1)
            b_ev = tail(banks[1 - par_a], ne, r_tot - p - 2)
            mirror_ev = (jnp.dot(a_ev, q1, preferred_element_type=jnp.float32)
                         + jnp.dot(b_ev, q0,
                                   preferred_element_type=jnp.float32))
            a_od = tail(banks[1 - par_a], no, r_tot - p - 2)
            b_od = tail(banks[par_a], no, r_tot - p - 3)
            mirror_od = (jnp.dot(a_od, q1, preferred_element_type=jnp.float32)
                         + jnp.dot(b_od, q0,
                                   preferred_element_type=jnp.float32))
            t0 = f_total - bf
            for r1 in range(n1):
                for tt in range(bf - 1, -1, -1):
                    s = 2 * (t0 + tt) + r1
                    r = s - (r_tot - p)
                    if r < 0:
                        break
                    m, par = divmod(r, 2)
                    src = mirror_ev if par == 0 else mirror_od
                    y2_ref[r1, tt, :] = (src[m] * win[r1]).astype(
                        y2_ref.dtype)

        @pl.when(j == 1)
        def _lm():
            left_mirror()

        @pl.when(j == nb)
        def _rm():
            right_mirror()

        # forward sublane stage + twiddle + forward lane stage; the
        # (2*n1s, bf*n2) dot output is staged through z_both (free after
        # phase 1) so it spills to a real scratch, not register slots
        z_both[...] = jnp.dot(
            fstack_ref[...].astype(y2_ref.dtype),
            y2_ref[...].reshape(n1s, bf * n2),
            preferred_element_type=jnp.float32,
        ).reshape(2 * n1s, bf, n2).astype(wd)
        mr = mr_ref[...].astype(wd)
        mi = mi_ref[...].astype(wd)
        for g in range(ng):
            r0 = g * 8
            zr = z_both[pl.ds(r0, 8)]
            zi = z_both[pl.ds(n1s + r0, 8)]
            ftr = ftwr_ref[pl.ds(r0, 8)][:, None, :].astype(wd)
            fti = ftwi_ref[pl.ds(r0, 8)][:, None, :].astype(wd)
            tzr = (zr * ftr - zi * fti).reshape(8 * bf, n2)
            tzi = (zr * fti + zi * ftr).reshape(8 * bf, n2)
            rr = (jnp.dot(tzr, mr, preferred_element_type=jnp.float32)
                  - jnp.dot(tzi, mi, preferred_element_type=jnp.float32))
            ri = (jnp.dot(tzr, mi, preferred_element_type=jnp.float32)
                  + jnp.dot(tzi, mr, preferred_element_type=jnp.float32))
            rr_ref[0, pl.ds(r0, 8)] = rr.reshape(8, bf, n2).astype(
                rr_ref.dtype)
            ri_ref[0, pl.ds(r0, 8)] = ri.reshape(8, bf, n2).astype(
                ri_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mom", "n1_true",
                                             "block_frames", "use_spec",
                                             "interpret"))
def fgla_iter(t, rk_r, rk_i, rp_r, rp_i, spec_w, merged_w,
              win_g, env_e, env_o, ctw, ftw, g_stack, f_stack,
              lane_inv, lane_fwd, mom: float, n1_true: int = 0,
              block_frames: int = 128, use_spec: bool = True,
              interpret=None):
    """One full Griffin-Lim iteration: (r_k, r_{k-1}) -> r_{k+1}.

    rk_*/rp_*: (..., n1s, F, n2) k1-major raw forward spectra of
    iterations k and k-1. spec_w/merged_w: target magnitudes on the same
    grid. t: scalar annealing lerp factor for THIS iteration (<= 0 means
    merged only; pass ``use_spec=False`` to compile a variant that skips
    the spec_w read entirely). win_g: (n1s, n2). env_e/env_o: parity-bank
    reciprocal envelope rows, shape (>= F + bf + _OVER, n2) fp32.
    ctw/ftw: (re, im) twiddles (n1s, n2). g_stack: (n1s, 2*n1s),
    f_stack: (2*n1s, n1s) sublane-stage bases. lane_inv/lane_fwd:
    (Gr, Gi) / (Mr, Mi) pairs of (n2, n2) lane-stage DFT matrices.
    Returns (rr, ri) = r_{k+1}, same shape/dtype as rk_r.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, n1s, f, n2 = rk_r.shape
    n1 = n1_true or n1s
    assert n2 == 128 and n1 % 2 == 0 and n1s % 8 == 0
    bc = int(np.prod(lead)) if lead else 1
    bf = _pick_block(f, n1, block_frames)
    assert bf is not None, (f, n1, block_frames)
    nb = f // bf
    rho = (n1 + 1) // 2
    assert _OVER >= rho + 1 and bf >= _OVER

    p1, p0, q1, q0 = _flip_mats(n2)
    anti = np.eye(max(rho + 1, 8), dtype=np.float32)[::-1].copy()

    def r4(x):
        return x.reshape(bc, n1s, f, n2)

    blk = pl.BlockSpec((1, n1s, bf, n2),
                       lambda a, j: (a, 0, jnp.minimum(j, nb - 1), 0))
    # with use_spec=False the kernel never reads sp_ref: pin its window
    # to block 0 so Mosaic fetches it once per bc instead of per step
    spec_blk = blk if use_spec else pl.BlockSpec(
        (1, n1s, bf, n2), lambda a, j: (a, 0, 0, 0))
    out_blk = pl.BlockSpec((1, n1s, bf, n2),
                           lambda a, j: (a, 0, jnp.maximum(j - 1, 0), 0))
    const = lambda shape: pl.BlockSpec(shape, lambda a, j: tuple(
        0 for _ in shape))

    kernel = functools.partial(
        _kernel, mom=float(mom), bf=bf, f_total=f, n1=n1, n1s=n1s, n2=n2,
        nb=nb, use_spec=bool(use_spec))

    in_arrays = [r4(rk_r), r4(rk_i), r4(rp_r), r4(rp_i), r4(spec_w),
                 r4(merged_w)]
    out = pl.pallas_call(
        kernel,
        grid=(bc, nb + 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]      # t
        + [blk] * 4 + [spec_blk, blk]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2             # env e/o
        + [const((n1s, n2))] * 5                              # win, tw x4
        + [const((n1s, 2 * n1s)), const((2 * n1s, n1s))]
        + [const((n2, n2))] * 4                               # Gr Gi Mr Mi
        + [const((n2, n2))] * 4                               # P1 P0 Q1 Q0
        + [const(anti.shape)],
        out_specs=[out_blk, out_blk],
        out_shape=[jax.ShapeDtypeStruct((bc, n1s, f, n2), rk_r.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * n1s, bf, n2), rk_r.dtype),        # z_both
            pltpu.VMEM((n1s, bf, n2), rk_r.dtype),            # y2
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # cur_e
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # cur_o
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # prev_e
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # prev_o
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # emit_e
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # emit_o
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # env e buf
            pltpu.VMEM((bf + _OVER, n2), jnp.float32),        # env o buf
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(t, jnp.float32).reshape(1, 1), *in_arrays,
      env_e, env_o,
      jnp.asarray(win_g, jnp.float32),
      jnp.asarray(ctw[0], jnp.float32), jnp.asarray(ctw[1], jnp.float32),
      jnp.asarray(ftw[0], jnp.float32), jnp.asarray(ftw[1], jnp.float32),
      jnp.asarray(g_stack, jnp.float32), jnp.asarray(f_stack, jnp.float32),
      jnp.asarray(lane_inv[0], jnp.float32),
      jnp.asarray(lane_inv[1], jnp.float32),
      jnp.asarray(lane_fwd[0], jnp.float32),
      jnp.asarray(lane_fwd[1], jnp.float32),
      jnp.asarray(p1), jnp.asarray(p0), jnp.asarray(q1), jnp.asarray(q0),
      jnp.asarray(anti))
    return out[0].reshape(rk_r.shape), out[1].reshape(rk_r.shape)
