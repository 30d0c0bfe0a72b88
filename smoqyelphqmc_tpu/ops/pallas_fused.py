"""Pallas-fused M^T M matvec: the innermost hot operation in one VMEM-resident kernel.

The XLA path (ops/fermion_det.py:mul_MtM) lowers to ~14 separate kernels per
application (4 checkerboard color sweeps x n_colors gathers + diagonal scalings
+ rolls), each round-tripping the (Ltau, N) space-time vector through HBM. This
kernel keeps the vector in VMEM for the whole M^T M chain:

    m = v + sgn_first (.) B roll(v, +1_tau),   out = m + sgn_last (.) roll(B^T m, -1_tau)

with the symmetric-factorization propagator B = CB^T D CB applied slice-wise.

TPU mapping (the load-bearing choices):
  - The per-color partner gather u[..., partner_c] is decomposed into LANE-ROLL
    CLASSES: on a periodic lattice every checkerboard color's partner map is an
    orbital swap + uniform cell displacement, so partner[n] = (n + s_k) mod N
    for a handful of static shifts s_k (2-4 on chain/square/honeycomb; torus
    wrap rows form their own class). The gather becomes
        u_partner = sum_k mask_k (.) roll(u, -s_k, lanes)
    with the masks folded into per-class S coefficient planes — pure VPU work,
    no MXU and no HBM. Irregular partner maps (no small class decomposition)
    fall back to an exact permutation matmul: P is 0/1 (bf16-exact) and u is
    split into three bf16 planes (8+8+8 mantissa bits = f32's 24), so three
    default-precision bf16 matmuls reconstruct the permuted f32 exactly.
  - Batch elements are processed in CHUNKS inside one kernel instance
    (grid over B/chunk); coefficient planes use a constant index map, so
    Pallas keeps them resident in VMEM across grid steps.
  - The tau axis rides the sublane dimension; the antiperiodic time shift is a
    sublane pltpu.roll plus precomputed (Ltau, 1) boundary-sign columns.

Scope: float32, real hoppings — exactly the production force-solve path
(driver default force_dtype="float32") and the inner loop of mixed-precision
CG. The whole-solve PCG kernel AND the standalone matvec kernels cover BOTH
factorizations (sym B = CB^T D CB and asym B = D CB with B^T = CB^T D). f64
action solves use the XLA path (Mosaic has no f64 compute); complex-hopping
models get the channel-mixing fused KPM apply (_kpm_mf_cplx_kernel) while
their matvecs ride XLA.

Reference for the operation semantics: /root/reference/src/FermionDetMatrix.jl:329-340
(mul_MtM!), :385-427 (mul_M!), :484-525 (mul_Mt!), and
checkerboard_matrix_multiply.jl:26-72 for the color sweeps.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/interpret only; import lazily-guarded
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# ----------------------------------------------------------------------
# host-side structure analysis
# ----------------------------------------------------------------------


def shift_classes(partner: np.ndarray, max_classes: int = 8):
    """Decompose each color's partner permutation into lane-roll classes.

    Returns (shifts, masks): shifts is a tuple (per color) of tuples of static
    lane shifts s with partner[n] = (n + s) mod N on the masked lanes; masks is
    a list (per color) of (n_classes_c, N) float32 0/1 planes. None when any
    color needs more than max_classes shifts (irregular lattice)."""
    n_colors, N = partner.shape
    shifts = []
    masks = []
    for c in range(n_colors):
        s = (partner[c] - np.arange(N)) % N
        vals = np.unique(s)
        # identity lanes (uncovered sites) carry S = 0; keep their class only
        # if 0 is a genuine shift of covered pairs — masks fold into S anyway
        if len(vals) > max_classes:
            return None
        shifts.append(tuple(int(v) for v in vals))
        masks.append(np.stack([(s == v).astype(np.float32) for v in vals]))
    return tuple(shifts), masks


def partner_onehot(partner: np.ndarray) -> np.ndarray:
    """(n_colors, N, N) one-hot permutation matrices P_c^T with
    (u @ P_c^T)[n] = u[partner_c[n]] — exactly representable in bf16."""
    n_colors, n_sites = partner.shape
    P = np.zeros((n_colors, n_sites, n_sites), dtype=np.float32)
    for c in range(n_colors):
        # (u @ PT)[.., n] = sum_k u[k] PT[k, n] with PT[k, n] = 1 iff k = partner[c, n]
        P[c, partner[c], np.arange(n_sites)] = 1.0
    return P


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------


def _permute_exact(u2d, PTc_bf16):
    """u2d[., partner] via three bf16 matmuls: exact f32 permutation.

    u = hi + mid + lo with each part bf16-exact (the final residual has <= 8
    significant bits left, so the decomposition terminates exactly); each
    product against the 0/1 matrix is exact in the f32 accumulator, and the
    three partial sums recombine to the original f32 values without rounding."""
    hi = u2d.astype(jnp.bfloat16)
    r1 = u2d - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    mm = lambda a: jax.lax.dot_general(  # noqa: E731
        a, PTc_bf16, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return mm(hi) + mm(mid) + mm(lo)


def _mtm_kernel_roll(v_ref, C_ref, Sk_ref, expV_ref, sgn1_ref, sgnL_ref, out_ref, *,
                     shifts, symmetric=True):
    """Roll-class variant. Sk_ref holds per-(color, class) masked S planes,
    flattened over the leading axis in color-major order. symmetric=False
    runs the ASYMMETRIC factorization B = D CB (B^T = CB^T D,
    FermionDetMatrix.jl:329-340 asym branch)."""
    v = v_ref[:]  # (Bc, Ltau, N)
    N = v.shape[-1]
    Ltau = v.shape[-2]
    n_colors = len(shifts)
    offsets = np.cumsum([0] + [len(s) for s in shifts])

    def cb(u, transpose):
        order = reversed(range(n_colors)) if transpose else range(n_colors)
        for c in order:
            acc = C_ref[c] * u
            for k, s in enumerate(shifts[c]):
                up = pltpu.roll(u, jnp.int32((N - s) % N), 2) if s else u
                acc = acc + Sk_ref[int(offsets[c]) + k] * up
            u = acc
        return u

    def apply_B(u):
        if symmetric:
            u = cb(u, transpose=True)
            u = expV_ref[:] * u
            return cb(u, transpose=False)
        u = cb(u, transpose=False)
        return expV_ref[:] * u

    def apply_Bt(u):
        if symmetric:
            return apply_B(u)  # sym: B^T = B
        u = expV_ref[:] * u
        return cb(u, transpose=True)

    u = pltpu.roll(v, jnp.int32(1), 1)
    u = apply_B(u)
    m = v + sgn1_ref[:] * u
    w = apply_Bt(m)
    w = pltpu.roll(w, jnp.int32(Ltau - 1), 1)  # roll by -1 (shift must be >= 0)
    out_ref[:] = m + sgnL_ref[:] * w


def _mtm_kernel_mm(v_ref, C_ref, S_ref, PT_ref, expV_ref, sgn1_ref, sgnL_ref, out_ref, *,
                   n_colors, symmetric=True):
    """Permutation-matmul fallback variant."""
    v = v_ref[:]  # (Bc, Ltau, N)
    Bc, Ltau, N = v.shape

    def cb(u, transpose):
        order = reversed(range(n_colors)) if transpose else range(n_colors)
        for c in order:
            up = _permute_exact(u.reshape(Bc * Ltau, N), PT_ref[c]).reshape(Bc, Ltau, N)
            u = C_ref[c] * u + S_ref[c] * up
        return u

    def apply_B(u):
        if symmetric:
            u = cb(u, transpose=True)
            u = expV_ref[:] * u
            return cb(u, transpose=False)
        u = cb(u, transpose=False)
        return expV_ref[:] * u

    def apply_Bt(u):
        if symmetric:
            return apply_B(u)
        u = expV_ref[:] * u
        return cb(u, transpose=True)

    u = pltpu.roll(v, jnp.int32(1), 1)
    u = apply_B(u)
    m = v + sgn1_ref[:] * u
    w = apply_Bt(m)
    w = pltpu.roll(w, jnp.int32(Ltau - 1), 1)
    out_ref[:] = m + sgnL_ref[:] * w


# index maps must return i32 under enable_x64 (the package default): python int
# literals would trace as i64 and Mosaic cannot legalize the index-map
# func.return (numpy scalar: index maps may not capture traced constants)
_Z = np.int32(0)

# VMEM budget for the fused kernels (bytes). v5e has ~16 MiB of VMEM per core;
# leave headroom for Mosaic's own spills/double-buffering. Kernels whose
# resident-set estimate exceeds this must NOT be built — the caller falls back
# to the XLA path — otherwise the Mosaic compile hard-fails (observed at
# L = 18, N = 648 on the headline Ltau = 240; also chunk = 4 at N = 288).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _fits_vmem(Ltau: int, N: int, n_colors: int, n_cls: int, n_state: int,
               chunk: int, extra: int = 0) -> bool:
    """Conservative f32 resident-set estimate for one grid step: n_state
    chunk-sized space-time vectors + the coefficient planes + DFT/eigenbasis
    matrices (`extra` covers Wre/Wim/Q/filt for the PCG kernel)."""
    plane = Ltau * N
    elems = n_state * chunk * plane + (n_colors + n_cls + 2) * plane + extra
    return elems * 4 <= _VMEM_BUDGET_BYTES


def _cb_tables(fdm):
    """(C, Sk-ready S) coefficient planes for the roll-class kernels.

    For static hoppings (no SSH: every tau row identical) the tables compress
    to single (.., 1, N) rows — broadcasting inside the kernel reproduces the
    full plane bit-for-bit while cutting the VMEM-resident table set ~Ltau x,
    which is what lets the whole-solve kernel fit at large N."""
    f32 = jnp.float32
    C = fdm.cb.C
    S = fdm.cb.S
    if fdm.static_hops:
        C = C[:, :1]
        S = S[:, :1]
    return C.astype(f32)[:, None], S.astype(f32)[:, None]


def _fold_masks(S, masks, n_colors):
    """(n_cls_total, 1, Lc, N) per-(color, class) masked S planes."""
    return jnp.concatenate(
        [S[c] * jnp.asarray(masks[c])[:, None, :] for c in range(n_colors)]
    )[:, None]


def _mtm_roll_call(v, C, Sk, expV, sgn1, sgnL, shifts, chunk: int, interpret: bool,
                   symmetric: bool = True):
    B, Ltau, N = v.shape
    kernel = functools.partial(_mtm_kernel_roll, shifts=shifts, symmetric=symmetric)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ltau, N), jnp.float32),
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, Ltau, N), lambda b: (b, _Z, _Z)),
            pl.BlockSpec(C.shape, lambda b: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec(Sk.shape, lambda b: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec((Ltau, N), lambda b: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda b: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda b: (_Z, _Z)),
        ],
        out_specs=pl.BlockSpec((chunk, Ltau, N), lambda b: (b, _Z, _Z)),
        interpret=interpret,
    )(v, C, Sk, expV, sgn1, sgnL)


def _mtm_mm_call(v, C, S, PT, expV, sgn1, sgnL, n_colors: int, chunk: int, interpret: bool,
                 symmetric: bool = True):
    B, Ltau, N = v.shape
    kernel = functools.partial(_mtm_kernel_mm, n_colors=n_colors, symmetric=symmetric)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ltau, N), jnp.float32),
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, Ltau, N), lambda b: (b, _Z, _Z)),
            pl.BlockSpec(C.shape, lambda b: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec(S.shape, lambda b: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec((n_colors, N, N), lambda b: (_Z, _Z, _Z)),
            pl.BlockSpec((Ltau, N), lambda b: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda b: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda b: (_Z, _Z)),
        ],
        out_specs=pl.BlockSpec((chunk, Ltau, N), lambda b: (b, _Z, _Z)),
        interpret=interpret,
    )(v, C, S, PT, expV, sgn1, sgnL)


# ----------------------------------------------------------------------
# public wrapper
# ----------------------------------------------------------------------


class FusedMtM:
    """Precomputed device arrays for the fused M^T M kernel of one fdm.

    Build once per fermion-matrix update via `build_fused_mtm`; apply with
    (..., Ltau, N) float32 operands (leading axes flattened into batch chunks).
    mode is 'roll' (lane-roll classes) or 'matmul' (exact permutation matmul)."""

    def __init__(self, mode, arrays, static, interpret, max_chunk=4, symmetric=True):
        self.mode = mode
        self.arrays = arrays
        self.static = static
        self.interpret = interpret
        self.max_chunk = max_chunk
        self.symmetric = symmetric

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        shape = v.shape
        Ltau, N = shape[-2], shape[-1]
        vb = v.astype(jnp.float32).reshape((-1, Ltau, N))
        B = vb.shape[0]
        chunk = 1
        while chunk < self.max_chunk and B % (chunk * 2) == 0:
            chunk *= 2
        if self.mode == "roll":
            out = _mtm_roll_call(
                vb, *self.arrays, shifts=self.static, chunk=chunk,
                interpret=self.interpret, symmetric=self.symmetric,
            )
        else:
            out = _mtm_mm_call(
                vb, *self.arrays, n_colors=self.static, chunk=chunk,
                interpret=self.interpret, symmetric=self.symmetric,
            )
        return out.reshape(shape)


def build_fused_mtm(
    fdm, interpret: Optional[bool] = None, max_chunk: int = 4, max_classes: int = 8
) -> Optional[FusedMtM]:
    """FusedMtM for a real-hopping fermion matrix (symmetric OR asymmetric
    factorization); None when the kernel does not apply (complex hoppings)."""
    if not _HAS_PALLAS or fdm.complex_hops or fdm.cb.n_colors == 0:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    f32 = jnp.float32
    C, S = _cb_tables(fdm)  # (nc, 1, Lc, N), Lc = 1 for static hoppings
    expV = fdm.exp_nV.astype(f32)
    sgn1 = _sign_col(fdm.Ltau, first=True)
    sgnL = _sign_col(fdm.Ltau, first=False)
    cls = shift_classes(fdm.cb.partner, max_classes=max_classes)
    if cls is not None:
        shifts, masks = cls
        n_cls_total = sum(len(s) for s in shifts)
        # table elements (static hoppings: rows, not planes) counted via extra
        Lc = C.shape[2]
        tab = (len(shifts) + n_cls_total) * Lc * fdm.n_sites
        while max_chunk > 1 and not _fits_vmem(
            fdm.Ltau, fdm.n_sites, 0, 0, 4, max_chunk, tab
        ):
            max_chunk //= 2
        if not _fits_vmem(fdm.Ltau, fdm.n_sites, 0, 0, 4, 1, tab):
            return None
        Sk = _fold_masks(S, masks, len(shifts))
        return FusedMtM("roll", (C, Sk, expV, sgn1, sgnL), shifts, interpret,
                        max_chunk, symmetric=fdm.symmetric)
    # matmul fallback: the (n_colors, N, N) bf16 permutation matrices join the
    # resident tables (counted via `extra` in f32-equivalent elements)
    pt_extra = (
        fdm.cb.n_colors * fdm.n_sites * fdm.n_sites // 2
        + 2 * fdm.cb.n_colors * C.shape[2] * fdm.n_sites
    )
    while max_chunk > 1 and not _fits_vmem(
        fdm.Ltau, fdm.n_sites, 0, 0, 4, max_chunk, pt_extra
    ):
        max_chunk //= 2
    if not _fits_vmem(fdm.Ltau, fdm.n_sites, 0, 0, 4, 1, pt_extra):
        return None
    PT = jnp.asarray(partner_onehot(fdm.cb.partner)).astype(jnp.bfloat16)
    return FusedMtM("matmul", (C, S, PT, expV, sgn1, sgnL), fdm.cb.n_colors, interpret,
                    max_chunk, symmetric=fdm.symmetric)


def _sign_col(Ltau: int, first: bool) -> jnp.ndarray:
    s = np.full((Ltau, 1), -1.0, dtype=np.float32)
    s[0 if first else Ltau - 1, 0] = 1.0
    return jnp.asarray(s)


# ======================================================================
# Fully-fused preconditioned CG: the whole Krylov loop in one kernel
# ======================================================================
#
# Profiling (BENCH.md round 2): a preconditioned f32 CG iteration costs
# ~1.25 ms at W = 8 of which the matvec is only ~0.2 ms and the spectral
# preconditioner ~0.34 ms — the rest is HBM traffic for the dots / axpy /
# masking chain over the (B, Ltau, N) Krylov vectors (~20 passes per
# iteration). This kernel runs the ENTIRE solve with x, r, p resident in
# VMEM: HBM touches the state exactly twice (load b/x0, store x). Each batch
# chunk iterates to its own convergence — no lockstep across chunks.
#
# The spectral preconditioner is applied with dense DFT matrices on the MXU
# (bf16 inputs, f32 accumulation): a preconditioner is a fixed SPD map, so its
# internal precision never affects the CG fixed point, only (marginally) the
# iteration count. The CG recurrences and dots stay f32.


def _pcg_ops(C_ref, Sk_ref, expV_ref, sgn1_ref, sgnL_ref,
             Wre_ref, Wim_ref, Q_ref, filt_ref,
             Bc, Ltau, N, shifts, symmetric):
    """Shared in-kernel operator set for the whole-solve CG kernels: the
    checkerboard sweep, the B / B^T / M^T M applications, the half-spectrum
    spectral-preconditioner apply, and the per-system reductions."""
    n_colors = len(shifts)
    offsets = np.cumsum([0] + [len(s) for s in shifts])

    def cb(u, transpose, neg=False):
        order = reversed(range(n_colors)) if transpose else range(n_colors)
        for c in order:
            acc = C_ref[c] * u
            for k, s in enumerate(shifts[c]):
                up = pltpu.roll(u, jnp.int32((N - s) % N), 2) if s else u
                plane = Sk_ref[int(offsets[c]) + k]
                acc = (acc - plane * up) if neg else (acc + plane * up)
            u = acc
        return u

    # sym: B = CB^T D CB (self-transpose); asym: B = D CB, B^T = CB^T D
    # (ops/fermion_det.py:apply_B/apply_Bt)
    def apply_B(u):
        if symmetric:
            u = cb(u, transpose=True)
            u = expV_ref[:] * u
            return cb(u, transpose=False)
        u = cb(u, transpose=False)
        return expV_ref[:] * u

    def apply_Bt(u):
        if symmetric:
            return apply_B(u)
        u = expV_ref[:] * u
        return cb(u, transpose=True)

    def mtm(v):
        u = pltpu.roll(v, jnp.int32(1), 1)
        u = apply_B(u)
        m = v + sgn1_ref[:] * u
        w = apply_Bt(m)
        w = pltpu.roll(w, jnp.int32(Ltau - 1), 1)
        return m + sgnL_ref[:] * w

    def tau_mm(W, u):
        # contract the tau (sublane) axis per chunk element: (Lw, L) @ (L, N);
        # bf16 operands, f32 accumulation — single-pass MXU (a preconditioner
        # is a fixed SPD map: its internal rounding only nudges the iteration
        # count, never the CG fixed point)
        ub = u.astype(jnp.bfloat16)
        return jnp.stack(
            [jnp.dot(W, ub[s], preferred_element_type=jnp.float32) for s in range(Bc)]
        )

    def precond(r):
        # z = F^H Q diag(filt) Q^T F r  (ops/spectral_precond.py:spectral_apply).
        # HALF-SPECTRUM: for real r the frequency data is conjugate-symmetric
        # (F[L-1-w] = conj(F[w])) and filt[w] = filt[L-1-w], so only the first
        # L/2 frequency rows are computed and the pair factor 2 is folded into
        # filt (build_fused_pcg). Wre/Wim are (Lh, L) bf16; filt is (Lh, N).
        ur = tau_mm(Wre_ref[:], r)
        ui = tau_mm(Wim_ref[:], r)
        Q = Q_ref[:]
        Lh = ur.shape[-2]
        mm = lambda a: jnp.dot(  # noqa: E731
            a.reshape(Bc * Lh, N).astype(jnp.bfloat16), Q,
            preferred_element_type=jnp.float32,
        ).reshape(Bc, Lh, N)
        mmT = lambda a: jnp.dot(  # noqa: E731
            a.reshape(Bc * Lh, N).astype(jnp.bfloat16), Q.T,
            preferred_element_type=jnp.float32,
        ).reshape(Bc, Lh, N)
        ar = mm(ur) * filt_ref[:]
        ai = mm(ui) * filt_ref[:]
        br = mmT(ar)
        bi = mmT(ai)
        # real part of the unitary inverse: W^H = conj(W)^T
        return tau_mm(Wre_ref[:].T, br) + tau_mm(Wim_ref[:].T, bi)

    def sdot(a, b):
        # per-system scalar: (Bc, Ltau, N) -> (Bc, 1). Reduce the sublane
        # (tau) axis FIRST with keepdims: reducing lanes first leaves a
        # (Bc, Ltau) row vector whose singleton-row relayout Mosaic rejects at
        # chunk = 1, and a fused axis=(1,2) sum produces a rank-1 vector that
        # crashes layout inference outright
        s = jnp.sum(a * b, axis=1, keepdims=True)  # (Bc, 1, N)
        return jnp.sum(s, axis=2)  # (Bc, 1)

    def col(s):  # (Bc, 1) -> (Bc, 1, 1) for broadcasting against vectors
        return s[:, :, None]

    return cb, apply_B, apply_Bt, mtm, precond, sdot, col


def _pcg_kernel(
    b_ref, C_ref, Sk_ref, expV_ref, sgn1_ref, sgnL_ref,
    Wre_ref, Wim_ref, Q_ref, filt_ref,
    x_ref, aux_ref,
    *, shifts, tol, maxiter, symmetric,
):
    Bc, Ltau, N = b_ref.shape
    # concrete 32-bit scalars: python literals would materialize as f64/i64
    # constants under enable_x64, which Mosaic cannot lower
    tol_c = np.float32(tol)
    one_c = np.float32(1.0)
    zero_c = np.float32(0.0)
    maxiter_c = np.int32(maxiter)
    cb, apply_B, apply_Bt, mtm, precond, sdot, col = _pcg_ops(
        C_ref, Sk_ref, expV_ref, sgn1_ref, sgnL_ref,
        Wre_ref, Wim_ref, Q_ref, filt_ref, Bc, Ltau, N, shifts, symmetric,
    )

    # The rhs arrives pre-scaled to unit norm per system (FusedPCG.__call__
    # divides by |b| outside and rescales the solution), so the convergence
    # test is ABSOLUTE here — |r| < tol on the scaled system IS the b-relative
    # criterion — and warm starts never enter the kernel: the caller solves
    # for the correction e = x - x0 against the residual rhs instead. This
    # keeps the kernel's resident set to ONE input block (the double-buffered
    # b/x0 pair was what pushed chunk = 4 past VMEM at the headline config).
    b = b_ref[:]
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rdotz = sdot(r, z)
    eps = jnp.sqrt(sdot(r, r))
    # active mask as f32 (0/1): Mosaic cannot reduce a bool array to the
    # while-loop's scalar condition
    active = jnp.where(eps >= tol_c, one_c, zero_c)

    def cond(carry):
        x, r, p, rdotz, eps, active, it = carry
        return jnp.logical_and(jnp.max(active) > zero_c, it < maxiter_c)

    def body(carry):
        x, r, p, rdotz, eps, active, it = carry
        on = active > zero_c
        Ap = mtm(p)
        pAp = sdot(p, Ap)
        alpha = jnp.where(on, rdotz / jnp.where(pAp != zero_c, pAp, one_c), zero_c)
        x = x + col(alpha) * p
        r = r - col(alpha) * Ap
        eps_new = jnp.sqrt(sdot(r, r))
        eps = jnp.where(on, eps_new, eps)
        on_new = jnp.logical_and(on, eps >= tol_c)
        z = precond(r)
        new_rdotz = sdot(r, z)
        beta = jnp.where(
            on_new, new_rdotz / jnp.where(rdotz != zero_c, rdotz, one_c), zero_c
        )
        p = jnp.where(col(on_new), z + col(beta) * p, p)
        rdotz = jnp.where(on_new, new_rdotz, rdotz)
        active = jnp.where(on_new, one_c, zero_c)
        return (x, r, p, rdotz, eps, active, it + np.int32(1))

    x, r, p, rdotz, eps, active, it = jax.lax.while_loop(
        cond, body, (x, r, p, rdotz, eps, active, jnp.int32(0))
    )
    x_ref[:] = x
    # pad the (Bc, 1) eps column and the scalar iteration count into the
    # (16, 128)-tiled auxiliary output block: rows 0..Bc-1 carry eps, rows
    # 8..15 carry the chunk's iteration count
    eps_pad = jnp.pad(eps, ((0, 8 - Bc), (0, 127)))
    it_plane = jnp.broadcast_to(it.astype(jnp.float32), (8, 128))
    aux_ref[0] = jnp.concatenate([eps_pad, it_plane], axis=0)


def _pcg_call(
    b, C, Sk, expV, sgn1, sgnL, Wre, Wim, Q, filt,
    shifts, tol: float, maxiter: int, chunk: int, interpret: bool,
    symmetric: bool = True,
):
    B, Ltau, N = b.shape
    Lh = Wre.shape[0]  # Ltau, or Ltau/2 under half-spectrum symmetry
    kernel = functools.partial(
        _pcg_kernel, shifts=shifts, tol=tol, maxiter=maxiter, symmetric=symmetric
    )
    n_chunks = B // chunk
    x, aux = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Ltau, N), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 16, 128), jnp.float32),
        ),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, Ltau, N), lambda i: (i, _Z, _Z)),
            pl.BlockSpec(C.shape, lambda i: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec(Sk.shape, lambda i: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec((Ltau, N), lambda i: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda i: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda i: (_Z, _Z)),
            pl.BlockSpec((Lh, Ltau), lambda i: (_Z, _Z)),
            pl.BlockSpec((Lh, Ltau), lambda i: (_Z, _Z)),
            pl.BlockSpec((N, N), lambda i: (_Z, _Z)),
            pl.BlockSpec((Lh, N), lambda i: (_Z, _Z)),
        ],
        out_specs=(
            pl.BlockSpec((chunk, Ltau, N), lambda i: (i, _Z, _Z)),
            pl.BlockSpec((1, 16, 128), lambda i: (i, _Z, _Z)),
        ),
        interpret=interpret,
    )(b, C, Sk, expV, sgn1, sgnL, Wre, Wim, Q, filt)
    eps = aux[:, :chunk, 0].reshape(B)
    iters = aux[:, 8, 0]  # per-chunk while-loop counts
    return x, eps, iters


class _RefVal:
    """Wrap an in-kernel VALUE so _pcg_ops' `ref[...]` reads return it (used to
    route extra per-plane operands through an existing trusted input slot)."""

    def __init__(self, v):
        self.v = v

    def __getitem__(self, idx):
        return self.v


def _pcg_force_kernel(
    bx0_ref, C_ref, Sk_ref, expVLam_ref, sgn1_ref, sgnL_ref,
    Wre_ref, Wim_ref, Q_ref, filt_ref,
    out_ref, aux_ref,
    *, shifts, tol, maxiter, symmetric, want_p2, probe="",
):
    """Whole-solve PCG + Holstein force-contraction epilogue in ONE kernel.

    The chunk is exactly the (re, im) channel pair of one pseudofermion system
    (Bc = 2). Unlike _pcg_kernel, the warm start is handled IN-KERNEL (r0 =
    b - A x0, relative |r| < tol |b| test per channel) because the epilogue
    needs the FULL solution psi_raw = x0 + e resident in VMEM: it then emits
    the two site-product planes P1/P2 that ops/derivatives.py:
    holstein_force_from_planes contracts into dS_f/dx — replacing the XLA
    chain of mul_M / checkerboard walks / mul_Mt / Lambda products
    (fermion_det_matrix_dervative.jl:258-290, holstein_shift_matrix.jl:156-201)
    that otherwise costs hundreds of small per-step fusions (BENCH.md trace).

    All planes ship through ONE packed output block out_ref = (4, Ltau, N):
    rows 0..1 the solution channels, row 2 = P1, row 3 = P2. A 4-output
    variant (x, P1, P2, aux) MISCOMPILES on v5e when the surrounding program
    is a lax.scan body (deterministically wrong planes at correct x; the same
    kernel is exact when jitted standalone) — packing everything into one
    block restores the 2-output shape of the production _pcg_kernel, which is
    scan-proven.

    Similarly, the INPUT signature is held to the production kernel's exact
    10-operand shape: the warm start x0 rides in the same block as b
    (bx0_ref = (4, Ltau, N): rows 0..1 = b, rows 2..3 = x0) and the Lambda
    plane rides below expV (expVLam_ref = (2 Ltau, N)). With x0 and Lam as
    SEPARATE operands (#2 and #12), the epilogue consumed a corrupted Lam in
    scan contexts — deterministically wrong planes at a correct solve."""
    four, Ltau, N = bx0_ref.shape
    Bc = four // 2
    tol_c = np.float32(tol)
    one_c = np.float32(1.0)
    zero_c = np.float32(0.0)
    tiny_c = np.float32(1e-30)
    maxiter_c = np.int32(maxiter)
    expV = expVLam_ref[0:Ltau]
    Lam = expVLam_ref[Ltau : 2 * Ltau]
    cb, apply_B, apply_Bt, mtm, precond, sdot, col = _pcg_ops(
        C_ref, Sk_ref, _RefVal(expV), sgn1_ref, sgnL_ref,
        Wre_ref, Wim_ref, Q_ref, filt_ref, Bc, Ltau, N, shifts, symmetric,
    )

    b = bx0_ref[0:2]
    x = bx0_ref[2:4]
    normb = jnp.sqrt(sdot(b, b))
    tol_col = tol_c * jnp.maximum(normb, tiny_c)
    r = b - mtm(x)
    z = precond(r)
    p = z
    rdotz = sdot(r, z)
    eps = jnp.sqrt(sdot(r, r))
    active = jnp.where(eps >= tol_col, one_c, zero_c)

    def cond(carry):
        x, r, p, rdotz, eps, active, it = carry
        return jnp.logical_and(jnp.max(active) > zero_c, it < maxiter_c)

    def body(carry):
        x, r, p, rdotz, eps, active, it = carry
        on = active > zero_c
        Ap = mtm(p)
        pAp = sdot(p, Ap)
        alpha = jnp.where(on, rdotz / jnp.where(pAp != zero_c, pAp, one_c), zero_c)
        x = x + col(alpha) * p
        r = r - col(alpha) * Ap
        eps_new = jnp.sqrt(sdot(r, r))
        eps = jnp.where(on, eps_new, eps)
        on_new = jnp.logical_and(on, eps >= tol_col)
        z = precond(r)
        new_rdotz = sdot(r, z)
        beta = jnp.where(
            on_new, new_rdotz / jnp.where(rdotz != zero_c, rdotz, one_c), zero_c
        )
        p = jnp.where(col(on_new), z + col(beta) * p, p)
        rdotz = jnp.where(on_new, new_rdotz, rdotz)
        active = jnp.where(on_new, one_c, zero_c)
        return (x, r, p, rdotz, eps, active, it + np.int32(1))

    x, r, p, rdotz, eps, active, it = jax.lax.while_loop(
        cond, body, (x, r, p, rdotz, eps, active, jnp.int32(0))
    )
    out_ref[0:2] = x

    # ---- force epilogue (same op order as _force_kernel / the XLA chain) ----
    psi = pltpu.roll(x, jnp.int32(1), 1) / Lam
    lam_psi = pltpu.roll(Lam * psi, jnp.int32(Ltau - 1), 1)
    w = apply_B(pltpu.roll(lam_psi, jnp.int32(1), 1))
    sw = sgn1_ref[:] * w
    A = lam_psi + sw  # = M lam_psi
    up2 = cb(A, transpose=True)  # CB^T (reversed colors)
    vp2 = cb(sw, transpose=True, neg=True)  # CB^{-1} (reversed colors, S -> -S)
    if probe == "lam":  # diagnostic probes: compiled-vs-interpret bisection
        out_ref[2] = Lam
        out_ref[3] = expV
        return
    if probe == "psi":
        out_ref[2] = psi[0]
        out_ref[3] = lam_psi[0]
        return
    if probe == "w":
        out_ref[2] = w[0]
        out_ref[3] = A[0]
        return
    if probe == "up":
        out_ref[2] = up2[0]
        out_ref[3] = vp2[0]
        return
    out_ref[2] = up2[0] * vp2[0] + up2[1] * vp2[1]
    if want_p2:
        MtA = A + sgnL_ref[:] * pltpu.roll(apply_Bt(A), jnp.int32(Ltau - 1), 1)
        MtA1 = pltpu.roll(MtA, jnp.int32(1), 1)
        out_ref[3] = MtA1[0] * psi[0] + MtA1[1] * psi[1]
    else:
        out_ref[3] = jnp.zeros((Ltau, N), jnp.float32)

    # relative residuals for CGStats (the in-kernel test is vs tol |b|)
    eps_rel = eps / jnp.maximum(normb, tiny_c)
    eps_pad = jnp.pad(eps_rel, ((0, 8 - Bc), (0, 127)))
    it_plane = jnp.broadcast_to(it.astype(jnp.float32), (8, 128))
    aux_ref[0] = jnp.concatenate([eps_pad, it_plane], axis=0)


def _pcg_force_call(
    b, x0, C, Sk, expV, sgn1, sgnL, Wre, Wim, Q, filt, Lam,
    shifts, tol: float, maxiter: int, interpret: bool,
    symmetric: bool, want_p2: bool,
):
    B, Ltau, N = b.shape  # B = 2 * n_systems (channel pairs)
    chunk = 2  # the epilogue contracts the channel pair of one system
    Lh = Wre.shape[0]
    import os as _os

    kernel = functools.partial(
        _pcg_force_kernel, shifts=shifts, tol=tol, maxiter=maxiter,
        symmetric=symmetric, want_p2=want_p2,
        probe=_os.environ.get("SMOQY_FORCE_PROBE", ""),
    )
    n_chunks = B // chunk
    # pack (b, x0) per chunk and (expV, Lam) per plane so the operand list is
    # EXACTLY the production _pcg_kernel's 10-input / 2-output signature (see
    # _pcg_force_kernel docstring for the scan-context corruption this dodges)
    bx0 = jnp.concatenate(
        [b.reshape(n_chunks, chunk, Ltau, N), x0.reshape(n_chunks, chunk, Ltau, N)],
        axis=1,
    ).reshape(n_chunks * 4, Ltau, N)
    expVLam = jnp.concatenate([expV, Lam], axis=0)
    out, aux = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * 4, Ltau, N), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 16, 128), jnp.float32),
        ),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((4, Ltau, N), lambda i: (i, _Z, _Z)),
            pl.BlockSpec(C.shape, lambda i: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec(Sk.shape, lambda i: (_Z, _Z, _Z, _Z)),
            pl.BlockSpec((2 * Ltau, N), lambda i: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda i: (_Z, _Z)),
            pl.BlockSpec((Ltau, 1), lambda i: (_Z, _Z)),
            pl.BlockSpec((Lh, Ltau), lambda i: (_Z, _Z)),
            pl.BlockSpec((Lh, Ltau), lambda i: (_Z, _Z)),
            pl.BlockSpec((N, N), lambda i: (_Z, _Z)),
            pl.BlockSpec((Lh, N), lambda i: (_Z, _Z)),
        ],
        out_specs=(
            pl.BlockSpec((4, Ltau, N), lambda i: (i, _Z, _Z)),
            pl.BlockSpec((1, 16, 128), lambda i: (i, _Z, _Z)),
        ),
        interpret=interpret,
    )(bx0, C, Sk, expVLam, sgn1, sgnL, Wre, Wim, Q, filt)
    blk = out.reshape(n_chunks, 4, Ltau, N)
    x = blk[:, :2].reshape(B, Ltau, N)
    P1 = blk[:, 2]
    P2 = blk[:, 3]
    eps = aux[:, :chunk, 0].reshape(B)
    iters = aux[:, 8, 0]
    return x, P1, P2, eps, iters


class FusedPCG:
    """Whole-solve fused preconditioned CG for one (fdm, spectral precond) pair.

    Built by `build_fused_pcg`; call with (b, x0, tol, maxiter) shaped
    (..., Ltau, N) float32. Returns (x, CGStats) with cg_solve-compatible
    semantics (per-system eps; converged = all finite + below tol; iters =
    max over batch chunks)."""

    def __init__(self, arrays, shifts, interpret, max_chunk=4, mtm=None, symmetric=True,
                 can_force=False):
        self.arrays = arrays
        self.shifts = shifts
        self.interpret = interpret
        self.max_chunk = max_chunk
        self.mtm = mtm  # XLA M^T M matvec for the out-of-kernel warm residual
        self.symmetric = symmetric
        # whether the solve+force epilogue variant fits VMEM (set by builder)
        self.can_force = can_force

    def solve_force(self, b: jnp.ndarray, Lam: jnp.ndarray, x0=None,
                    tol: float = 1e-5, maxiter: int = 500, want_p2: bool = True):
        """Solve [M^T M] psi_raw = b for one channel-pair system (2, Ltau, N)
        AND emit the Holstein force product planes P1/P2 (Ltau, N) from the
        same kernel (see _pcg_force_kernel). Returns (psi_raw, P1, P2, CGStats)."""
        from .cg import CGStats

        shape = b.shape
        Ltau, N = shape[-2], shape[-1]
        bb = b.astype(jnp.float32).reshape((-1, Ltau, N))
        if x0 is None:
            xx0 = jnp.zeros_like(bb)
        else:
            xx0 = x0.astype(jnp.float32).reshape((-1, Ltau, N))
        x, P1, P2, eps, iters = _pcg_force_call(
            bb, xx0, *self.arrays, Lam.astype(jnp.float32),
            shifts=self.shifts, tol=float(tol), maxiter=int(maxiter),
            interpret=self.interpret, symmetric=self.symmetric, want_p2=want_p2,
        )
        x = x.reshape(shape)
        P1 = P1.reshape(shape[:-3] + (Ltau, N)) if P1.shape[0] == 1 else P1
        P2 = P2.reshape(shape[:-3] + (Ltau, N)) if P2.shape[0] == 1 else P2
        eps = eps.reshape(shape[:-2]) if len(shape) > 2 else eps.reshape(())
        iters = jnp.max(iters).astype(jnp.int32)
        finite = jnp.all(jnp.isfinite(x))
        converged = jnp.logical_and(finite, jnp.all(eps < tol))
        return x, P1, P2, CGStats(iters=iters, eps=eps, converged=converged)

    def __call__(self, b: jnp.ndarray, x0=None, tol: float = 1e-5, maxiter: int = 500):
        from .cg import CGStats

        shape = b.shape
        Ltau, N = shape[-2], shape[-1]
        bb = b.astype(jnp.float32).reshape((-1, Ltau, N))
        B = bb.shape[0]
        chunk = 1
        while chunk < self.max_chunk and B % (chunk * 2) == 0:
            chunk *= 2
        # normalize per system so the kernel's ABSOLUTE stopping test |r| < tol
        # is exactly the b-relative criterion; a warm start becomes a cold
        # solve for the correction e = x - x0 against the residual rhs (one
        # XLA matvec here buys the kernel a single-input resident set, which
        # is what lets chunk = 4 fit VMEM at the headline config)
        normb = jnp.sqrt(jnp.sum(bb * bb, axis=(1, 2), keepdims=True))
        safe_normb = jnp.where(normb > 0, normb, 1.0)
        if x0 is None:
            rhs = bb / safe_normb
        else:
            xx0 = x0.astype(jnp.float32).reshape((-1, Ltau, N))
            # mtm may come from an f64 fdm (the mixed-precision build path):
            # the kernel's rhs must stay f32 regardless
            rhs = (bb - self.mtm(xx0).astype(jnp.float32)) / safe_normb
        # TRACED tolerance support without a traced kernel operand: the
        # kernel's test is absolute on the fed (unit-norm) system, so scaling
        # the rhs by kernel_tol / tol makes the static kernel_tol act as the
        # requested relative tolerance — one scalar multiply, no recompile per
        # tol value (used by cg_solve_mixed's adaptive last-cycle tolerance).
        traced_tol = not isinstance(tol, (int, float, np.floating))
        if traced_tol:
            kernel_tol = 1e-5
            tscale = (jnp.asarray(kernel_tol, jnp.float32)
                      / jnp.maximum(tol, 1e-30).astype(jnp.float32))
            rhs = rhs * tscale
        else:
            kernel_tol = float(tol)
        x, eps, iters = _pcg_call(
            rhs, *self.arrays,
            shifts=self.shifts, tol=kernel_tol, maxiter=int(maxiter),
            chunk=chunk, interpret=self.interpret, symmetric=self.symmetric,
        )
        if traced_tol:
            x = x / tscale
            eps = eps / tscale
        x = x * safe_normb
        if x0 is not None:
            x = x + xx0
        x = x.reshape(shape)
        eps = eps.reshape(shape[:-2]) if len(shape) > 2 else eps.reshape(())
        iters = jnp.max(iters).astype(jnp.int32)
        finite = jnp.all(jnp.isfinite(x))
        converged = jnp.logical_and(finite, jnp.all(eps < tol))
        return x, CGStats(iters=iters, eps=eps, converged=converged)


# ======================================================================
# Fused force contraction: the fermionic dS_f/dx chain in one kernel
# ======================================================================
#
# After the (fused) CG solve, the XLA force path still walks psi_raw through
# ~18 separate HBM-round-tripping kernels (mul_M, apply_B, two checkerboard
# sweeps, mul_Mt, Lambda rolls/divides, channel products — ops/pff.py:
# fermionic_action_and_force + ops/derivatives.py). For the production
# Holstein path (symmetric factorization, real hoppings, n_ssh = 0) the whole
# chain reduces to six checkerboard color sweeps plus elementwise work, all of
# which fits in VMEM. This kernel reads psi_raw once and emits the two
# site-local product planes the forces contract against:
#
#   P1[l, n] = sum_ch (CB^T A)[ch, l, n] * (CB^{-1} B sgn1 roll(psi))[ch, l, n]
#       with A = M lam_psi           (M-derivative potential term,
#                                     fermion_det_matrix_dervative.jl:258-290)
#   P2[l, n] = sum_ch roll(M^T A, +1)[ch, l, n] * psi[ch, l, n]
#                                    (Lambda-derivative term,
#                                     holstein_shift_matrix.jl:156-201)
#
# The B-propagator application is SHARED between the derivative column and
# M lam_psi (B commutes with the +-1 tau boundary-sign column), saving two of
# the XLA path's eight color sweeps. The per-coupling coefficients (dV/dx,
# dLambda/dx) and the tiny (n_phonon, Ltau) scatter stay outside in XLA —
# ops/derivatives.py:holstein_force_from_planes.


def _force_kernel(
    psi_ref, C_ref, Sk_ref, expV_ref, sgn1_ref, sgnL_ref, Lam_ref,
    P1_ref, P2_ref,
    *, shifts, want_p2,
):
    Bc, Ltau, N = psi_ref.shape  # Bc = 2: the re/im channel pair of one system
    n_colors = len(shifts)
    offsets = np.cumsum([0] + [len(s) for s in shifts])

    def cb(u, reverse, neg=False):
        order = reversed(range(n_colors)) if reverse else range(n_colors)
        for c in order:
            acc = C_ref[c] * u
            for k, s in enumerate(shifts[c]):
                up = pltpu.roll(u, jnp.int32((N - s) % N), 2) if s else u
                plane = Sk_ref[int(offsets[c]) + k]
                acc = (acc - plane * up) if neg else (acc + plane * up)
            u = acc
        return u

    def apply_B(u):
        u = cb(u, reverse=True)
        u = expV_ref[:] * u
        return cb(u, reverse=False)

    psi_raw = psi_ref[:]
    Lam = Lam_ref[:]
    # replicate the XLA op order bit-for-bit: psi = Lambda^{-1} psi_raw,
    # lam_psi = Lambda psi (identity up to one rounding round-trip)
    psi = pltpu.roll(psi_raw, jnp.int32(1), 1) / Lam
    lam_psi = pltpu.roll(Lam * psi, jnp.int32(Ltau - 1), 1)
    w = apply_B(pltpu.roll(lam_psi, jnp.int32(1), 1))
    sw = sgn1_ref[:] * w
    A = lam_psi + sw  # = M lam_psi
    up2 = cb(A, reverse=True)  # CB^T (transpose = reversed colors)
    vp2 = cb(sw, reverse=True, neg=True)  # CB^{-1} (reversed colors, S -> -S)
    P1_ref[:] = up2[0] * vp2[0] + up2[1] * vp2[1]
    if want_p2:
        MtA = A + sgnL_ref[:] * pltpu.roll(apply_B(A), jnp.int32(Ltau - 1), 1)
        MtA1 = pltpu.roll(MtA, jnp.int32(1), 1)
        P2_ref[:] = MtA1[0] * psi[0] + MtA1[1] * psi[1]
    else:
        P2_ref[:] = jnp.zeros((Ltau, N), jnp.float32)


class FusedForce:
    """Fused Holstein force-contraction planes for one fdm + Lambda.

    Call with psi_raw (2, Ltau, N) float32; returns (P1, P2) (Ltau, N) planes
    consumed by ops/derivatives.py:holstein_force_from_planes."""

    def __init__(self, arrays, shifts, want_p2, interpret):
        self.arrays = arrays
        self.shifts = shifts
        self.want_p2 = want_p2
        self.interpret = interpret

    def __call__(self, psi_raw: jnp.ndarray):
        Bc, Ltau, N = psi_raw.shape
        kernel = functools.partial(
            _force_kernel, shifts=self.shifts, want_p2=self.want_p2
        )
        # explicit trivial grid + i32 index maps: under vmap (walker batching)
        # pallas prepends the batch index to THESE maps; a grid-less call would
        # get auto-generated python-int (i64 under x64) zeros, which Mosaic
        # cannot legalize (see the i64 index-map pitfall at _Z above)
        full = lambda *dims: pl.BlockSpec(  # noqa: E731
            dims, lambda i: tuple(_Z for _ in dims)
        )
        C, Sk = self.arrays[0], self.arrays[1]
        P1, P2 = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Ltau, N), jnp.float32),
                jax.ShapeDtypeStruct((Ltau, N), jnp.float32),
            ),
            grid=(1,),
            in_specs=[
                full(Bc, Ltau, N),
                full(*C.shape),
                full(*Sk.shape),
                full(Ltau, N),
                full(Ltau, 1),
                full(Ltau, 1),
                full(Ltau, N),
            ],
            out_specs=(full(Ltau, N), full(Ltau, N)),
            interpret=self.interpret,
        )(psi_raw.astype(jnp.float32), *self.arrays)
        return P1, P2


def build_fused_force(fdm, Lam, want_p2: bool, interpret: Optional[bool] = None):
    """FusedForce for the symmetric real-hopping Holstein-only path; None when
    the kernel does not apply. Lam is the (Ltau, N) shift matrix the contraction
    divides by (traced). Call inside the consuming jit (tables must be traced
    arguments — see build_fused_pcg)."""
    if not _HAS_PALLAS or fdm.complex_hops or not fdm.symmetric or fdm.cb.n_colors == 0:
        return None
    cls = shift_classes(fdm.cb.partner)
    if cls is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shifts, masks = cls
    n_cls_total = sum(len(s) for s in shifts)
    f32 = jnp.float32
    C, S = _cb_tables(fdm)
    # channel pair + ~6 live temps next to the tables + Lambda plane
    tab = (len(shifts) + n_cls_total) * C.shape[2] * fdm.n_sites
    if not _fits_vmem(
        fdm.Ltau, fdm.n_sites, 0, 0, 8, 2, fdm.Ltau * fdm.n_sites + tab
    ):
        return None
    Sk = _fold_masks(S, masks, len(shifts))
    arrays = (
        C, Sk, fdm.exp_nV.astype(f32),
        _sign_col(fdm.Ltau, True), _sign_col(fdm.Ltau, False),
        Lam.astype(f32),
    )
    return FusedForce(arrays, shifts, want_p2, interpret)


def fused_cg_mode() -> Optional[str]:
    """Trace-time gate for the fused solver: 'compiled' on a real TPU backend,
    'interpret' when SMOQY_FUSED_CG=interpret (CPU testing), None when disabled
    (SMOQY_FUSED_CG=0 or non-TPU backend)."""
    import os

    mode = os.environ.get("SMOQY_FUSED_CG", "auto")
    if mode == "0":
        return None
    if mode == "interpret":
        return "interpret"
    return "compiled" if jax.default_backend() == "tpu" else None


def build_fused_pcg(fdm, pre, interpret: Optional[bool] = None, max_chunk: int = 2):
    """FusedPCG when the configuration supports it (symmetric real-hopping fdm
    + spectral preconditioner with matching sizes); None otherwise.

    IMPORTANT: call this with TRACED (fdm, pre) inside the consuming jit — the
    table arrays must reach the pallas_call as traced arguments. Closure-
    captured device arrays in a jit containing a pallas_call are re-shipped on
    every dispatch (~30 ms measured over the device tunnel, BENCH.md).

    max_chunk = 2: since the kernel went single-input (rhs only — warm starts
    and per-system normalization moved outside, see FusedPCG.__call__) chunk 4
    compiles at the headline Ltau = 240, N = 288 on a PLAIN grid, but the same
    kernel VMAPPED over walkers hits Mosaic's scoped-vmem stack limit (18.7M
    vs 16M for the W = 8, Nrv = 10 estimator refresh) — and chunk 4 measured
    throughput-neutral anyway (the solve is not latency-bound), so 2 is both
    the safe and the fast choice."""
    from .spectral_precond import SpectralPreconditioner

    # symmetric AND asymmetric factorizations are supported (the asym matvec
    # uses B = D CB / B^T = CB^T D inside the kernel; the asym spectral
    # preconditioner's half-angle Q/filt apply is structurally identical)
    if not _HAS_PALLAS or fdm.complex_hops or fdm.cb.n_colors == 0:
        return None
    if not isinstance(pre, SpectralPreconditioner) or pre.complex_pair:
        return None
    if pre.Q.shape[0] != fdm.n_sites:
        return None
    cls = shift_classes(fdm.cb.partner)
    if cls is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shifts, masks = cls
    # whole-solve Krylov state (b, x, r, p, z, Ap + preconditioner temps) must
    # fit VMEM next to the tables + DFT/eigenbasis matrices; reduce the chunk
    # or refuse (-> XLA fallback) rather than hard-failing the Mosaic compile
    # (observed at N = 648, Ltau = 240)
    Ltau = fdm.Ltau
    N = fdm.n_sites
    # half-spectrum for even Ltau: conjugate frequency pairs (w, L-1-w) carry
    # identical filters, so only L/2 rows are computed and the pair factor 2 is
    # folded into filt — exactly the reference's conjugate-symmetry halving
    # (KPMPreconditioner.jl:314-335). Odd Ltau keeps the full spectrum.
    Lh = Ltau // 2 if Ltau % 2 == 0 else Ltau
    n_cls_total = sum(len(s) for s in shifts)
    C, S = _cb_tables(fdm)  # static hoppings: (.., 1, N) rows, not planes
    Lc = C.shape[2]
    # bf16 DFT/eigenbasis tables count at half an f32 element each; the C/Sk
    # coefficient tables are counted at their true (possibly compressed) size
    pcg_extra = (
        (2 * Lh * Ltau + N * N) // 2 + Lh * N
        + (len(shifts) + n_cls_total) * Lc * N
    )
    # resident planes per chunk unit: rhs in + x out (double-buffered: 4) +
    # while-carry x, r, p (3) + Ap, z (2) — the preconditioner's half-spectrum
    # temps overlap with Ap/z liveness. Empirical anchors on v5e (16 MiB):
    # chunk 4 at (Ltau 240, N 288) compiles, chunk 8 does not.
    while max_chunk > 1 and not _fits_vmem(
        Ltau, N, 0, 0, 9, max_chunk, pcg_extra
    ):
        max_chunk //= 2
    if not _fits_vmem(Ltau, N, 0, 0, 9, 1, pcg_extra):
        return None
    f32 = jnp.float32
    Sk = _fold_masks(S, masks, len(shifts))
    # dense antiperiodic DFT matrices (ops/fourier.py dft semantics):
    # W[w, l] = (1/sqrt(L)) exp(-i (2 pi w + pi) l / L), first Lh rows
    w = np.arange(Lh)[:, None]
    l = np.arange(Ltau)[None, :]
    ang = -(2.0 * np.pi * w + np.pi) * l / Ltau
    Wre = jnp.asarray((np.cos(ang) / np.sqrt(Ltau)).astype(np.float32)).astype(jnp.bfloat16)
    Wim = jnp.asarray((np.sin(ang) / np.sqrt(Ltau)).astype(np.float32)).astype(jnp.bfloat16)
    pair = 2.0 if Lh < Ltau else 1.0
    arrays = (
        C, Sk, fdm.exp_nV.astype(f32),
        _sign_col(Ltau, True), _sign_col(Ltau, False),
        Wre, Wim, pre.Q.astype(jnp.bfloat16), pair * pre.filt[:Lh].astype(f32),
    )
    # solve+force epilogue variant (sym Holstein path): chunk pinned to the
    # channel pair (2); the epilogue's extra residency = the Lam plane + the
    # in-kernel x0 input + ~3 live temps over the Krylov set
    can_force = fdm.symmetric and _fits_vmem(
        Ltau, N, 0, 0, 12, 2, pcg_extra + Ltau * N
    )
    return FusedPCG(arrays, shifts, interpret, max_chunk, mtm=fdm.mul_MtM,
                    symmetric=fdm.symmetric, can_force=can_force)


# ======================================================================
# Fused matrix-free KPM apply: per-frequency Chebyshev recurrence in VMEM
# ======================================================================
#
# The XLA matrix-free recurrence (ops/kpm.py:_mf_cheb) is O(n_colors N) per
# order but runs C sequential HOST-SCHEDULED steps of a lax.scan, each a
# handful of small gather/elementwise fusions — at N = 1152 that measured
# ~24 ms per apply (1.2 s per 50-iteration CG solve, scripts/scaling_bench.py),
# pure dispatch-latency, not FLOPs. This kernel moves the whole recurrence
# into VMEM (the reference's apply structure, KPMPreconditioner.jl:288-352):
#
#   - the frequency axis is SORTED by descending Chebyshev order and split
#     into grid blocks; each grid step runs its own in-kernel while loop up
#     to the block's live order (a traced per-block bound), so the total
#     sequential depth is sum_blocks max-order-in-block (~Ltau/blkF *
#     harmonic tail) instead of n_blocks * C_max — most frequencies need
#     single-digit orders and exit after a few microsecond-scale iterations;
#   - Bbar' applies through the same lane-roll-class checkerboard sweep as
#     the fused M^T M matvec, with single (N,) coefficient rows (the
#     tau-AVERAGED factors have no time axis);
#   - per-step coefficients come from an in-VMEM (blkF, C_pad) table via an
#     iota-mask contraction (no dynamic lane indexing).
#
# SYMMETRIC factorization + real hoppings only (the production large-N
# path); the asymmetric two-pass complex recurrence stays on the XLA path.


def _kpm_mf_kernel(u_ref, Crow_ref, Skrow_ref, expVih_ref, cih_ref,
                   coef_ref, bound_ref, out_ref, *, shifts):
    """y = sum_k c_k(f) T_k(Bbar') u for one (row-chunk, frequency-block):
    u_ref (cR, blkF, N); Crow/Skrow single-slice checkerboard rows;
    expVih = expV_bar / half, cih = center / half (the Bbar -> Bbar' affine
    map folded into the diagonal factors); coef_ref (blkF, C_pad) Chebyshev
    coefficient planes (zero beyond each frequency's live order); bound_ref
    (n_fb, 1) per-block max live orders, indexed by the frequency grid axis
    (tiny, shipped whole to every grid step: (1,1) blocks fail the TPU
    (8,128)-divisibility lowering rule)."""
    u = u_ref[:]  # (cR, blkF, N)
    N = u.shape[-1]
    n_colors = len(shifts)
    offsets = np.cumsum([0] + [len(s) for s in shifts])

    def cb(t, transpose):
        order = reversed(range(n_colors)) if transpose else range(n_colors)
        for c in order:
            acc = Crow_ref[c] * t
            for k, s in enumerate(shifts[c]):
                tp = pltpu.roll(t, jnp.int32((N - s) % N), 2) if s else t
                acc = acc + Skrow_ref[int(offsets[c]) + k] * tp
            t = acc
        return t

    def applyBp(t):
        w = cb(t, transpose=True)
        w = expVih_ref[:] * w
        w = cb(w, transpose=False)
        return w - cih_ref[:] * t

    coefs = coef_ref[:]  # (blkF, C_pad)
    C_pad = coefs.shape[-1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, C_pad), 1)

    def coef_at(it):
        m = (kcol == it).astype(jnp.float32)
        return jnp.sum(coefs * m, axis=-1, keepdims=True)  # (blkF, 1)

    bound = bound_ref[pl.program_id(1), 0].astype(jnp.int32)
    y = coef_at(jnp.int32(0)) * u
    t1 = applyBp(u)

    def cond(carry):
        _, _, _, it = carry
        return it < bound

    def body(carry):
        t_prev, t_cur, y, it = carry
        y = y + coef_at(it) * t_cur
        t_next = 2.0 * applyBp(t_cur) - t_prev
        return (t_cur, t_next, y, it + np.int32(1))

    _, _, y, _ = jax.lax.while_loop(cond, body, (u, t1, y, jnp.int32(1)))
    out_ref[:] = y


def _kpm_mf_asym_kernel(u_ref, Crow_ref, Skrow_ref, expVih_ref, cih_ref,
                        cre_ref, cim_ref, bound_ref, out_ref, *, shifts):
    """Two-pass ASYMMETRIC KPM apply for one (pair-chunk, frequency-block).

    u_ref (2, blkF, N) holds the (re, im) rows of ONE complex frequency-space
    vector; pass 1 applies sum_k conj(c)_k T_k(Bbar'), pass 2 applies
    sum_k c_k T_k(Bbar') to its output (the reference's two conjugate ldiv!
    passes, KPMPreconditioner.jl:455-459), with the complex coefficient acting
    through the in-chunk row rotation i (re, im) = (-im, re). Bbar' is the
    asymmetric scaled propagator (expV * CB - center)/half; hoppings are real,
    so the recurrence itself never mixes the two rows — only the coefficient
    accumulation does."""
    N = u_ref.shape[-1]
    n_colors = len(shifts)
    offsets = np.cumsum([0] + [len(s) for s in shifts])

    def cb(t):
        for c in range(n_colors):
            acc = Crow_ref[c] * t
            for k, s in enumerate(shifts[c]):
                tp = pltpu.roll(t, jnp.int32((N - s) % N), 2) if s else t
                acc = acc + Skrow_ref[int(offsets[c]) + k] * tp
            t = acc
        return t

    def applyBp(t):
        w = cb(t)
        w = expVih_ref[:] * w
        return w - cih_ref[:] * t

    cre = cre_ref[:]  # (blkF, C_pad)
    cim = cim_ref[:]
    C_pad = cre.shape[-1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, C_pad), 1)

    def coef_at(tab, it):
        m = (kcol == it).astype(jnp.float32)
        return jnp.sum(tab * m, axis=-1, keepdims=True)  # (blkF, 1)

    bound = bound_ref[pl.program_id(1), 0].astype(jnp.int32)

    def rot(t):  # i * (re, im) = (-im, re) across the chunk rows
        return jnp.concatenate([-t[1:2], t[0:1]], axis=0)

    def cheb_pass(u, sgn_im):
        y = coef_at(cre, jnp.int32(0)) * u + sgn_im * coef_at(cim, jnp.int32(0)) * rot(u)
        t1 = applyBp(u)

        def cond(carry):
            return carry[3] < bound

        def body(carry):
            t_prev, t_cur, y, it = carry
            y = y + coef_at(cre, it) * t_cur + sgn_im * coef_at(cim, it) * rot(t_cur)
            t_next = 2.0 * applyBp(t_cur) - t_prev
            return (t_cur, t_next, y, it + np.int32(1))

        _, _, y, _ = jax.lax.while_loop(cond, body, (u, t1, y, jnp.int32(1)))
        return y

    y1 = cheb_pass(u_ref[:], np.float32(-1.0))
    out_ref[:] = cheb_pass(y1, np.float32(1.0))


def _kpm_mf_cplx_kernel(u_ref, Crow_ref, Skrow_ref, SkImrow_ref, expVih_ref,
                        cih_ref, cre_ref, cim_ref, bound_ref, out_ref, *,
                        shifts, symmetric):
    """COMPLEX-HOPPING KPM apply for one (pair-chunk, frequency-block).

    u_ref (2, blkF, N) holds the (re, im) rows of ONE complex frequency-space
    vector. With complex t each hop block is Hermitian and the checkerboard
    itself MIXES the two rows (ops/checkerboard.py complex branch):

        re' = C re + S re[p] - S_im im[p],   im' = C im + S im[p] + S_im re[p]

    realized as lane rolls with per-class masked S and S_im planes. The
    adjoint is the same factors in reversed color order (Hermitian blocks).
    Symmetric factorization: Bbar = CB^H expV CB is Hermitian, coefficients
    are REAL, one pass, no i-rotation. Asymmetric: two conjugate passes with
    the complex coefficient acting through the in-chunk row rotation
    i (re, im) = (-im, re), exactly _kpm_mf_asym_kernel's structure — here the
    field's complex structure and the operator's coincide (the XLA analogue is
    ops/kpm.py:_mf_cheb_pair). Reference behavior contract:
    KPMPreconditioner.jl:288-352 (ldiv!), :417-550 (matrix-free expansion)."""
    N = u_ref.shape[-1]
    n_colors = len(shifts)
    offsets = np.cumsum([0] + [len(s) for s in shifts])

    def cb(t, transpose):
        order = reversed(range(n_colors)) if transpose else range(n_colors)
        for c in order:
            re, im = t[0:1], t[1:2]
            acc_re = Crow_ref[c] * re
            acc_im = Crow_ref[c] * im
            for k, s in enumerate(shifts[c]):
                rp = pltpu.roll(re, jnp.int32((N - s) % N), 2) if s else re
                ip = pltpu.roll(im, jnp.int32((N - s) % N), 2) if s else im
                sk = Skrow_ref[int(offsets[c]) + k]
                ski = SkImrow_ref[int(offsets[c]) + k]
                acc_re = acc_re + sk * rp - ski * ip
                acc_im = acc_im + sk * ip + ski * rp
            t = jnp.concatenate([acc_re, acc_im], axis=0)
        return t

    def applyBp(t):
        if symmetric:
            w = cb(t, transpose=True)
            w = expVih_ref[:] * w
            w = cb(w, transpose=False)
        else:
            w = cb(t, transpose=False)
            w = expVih_ref[:] * w
        return w - cih_ref[:] * t

    cre = cre_ref[:]  # (blkF, C_pad)
    cim = cim_ref[:]
    C_pad = cre.shape[-1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, C_pad), 1)

    def coef_at(tab, it):
        m = (kcol == it).astype(jnp.float32)
        return jnp.sum(tab * m, axis=-1, keepdims=True)  # (blkF, 1)

    bound = bound_ref[pl.program_id(1), 0].astype(jnp.int32)

    def rot(t):  # i * (re, im) = (-im, re) across the chunk rows
        return jnp.concatenate([-t[1:2], t[0:1]], axis=0)

    def cheb_pass(u, sgn_im):
        y = coef_at(cre, jnp.int32(0)) * u
        if not symmetric:
            y = y + sgn_im * coef_at(cim, jnp.int32(0)) * rot(u)
        t1 = applyBp(u)

        def cond(carry):
            return carry[3] < bound

        def body(carry):
            t_prev, t_cur, y, it = carry
            y = y + coef_at(cre, it) * t_cur
            if not symmetric:
                y = y + sgn_im * coef_at(cim, it) * rot(t_cur)
            t_next = 2.0 * applyBp(t_cur) - t_prev
            return (t_cur, t_next, y, it + np.int32(1))

        _, _, y, _ = jax.lax.while_loop(cond, body, (u, t1, y, jnp.int32(1)))
        return y

    if symmetric:
        # Hermitian Bbar: real coefficients, single pass
        out_ref[:] = cheb_pass(u_ref[:], np.float32(0.0))
    else:
        y1 = cheb_pass(u_ref[:], np.float32(-1.0))
        out_ref[:] = cheb_pass(y1, np.float32(1.0))


def _kpm_mf_cplx_call(u, Crow, Skrow, SkImrow, expVih, cih, cre, cim, bounds,
                      shifts, blkF: int, symmetric: bool, interpret: bool):
    R, F, N = u.shape  # R = 2 B interleaved (re, im) pairs
    kernel = functools.partial(_kpm_mf_cplx_kernel, shifts=shifts, symmetric=symmetric)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, F, N), jnp.float32),
        grid=(R // 2, F // blkF),
        in_specs=[
            pl.BlockSpec((2, blkF, N), lambda r, b: (r, b, _Z)),
            pl.BlockSpec(Crow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec(Skrow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec(SkImrow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec((1, N), lambda r, b: (_Z, _Z)),
            pl.BlockSpec((1, N), lambda r, b: (_Z, _Z)),
            pl.BlockSpec((blkF, cre.shape[-1]), lambda r, b: (b, _Z)),
            pl.BlockSpec((blkF, cim.shape[-1]), lambda r, b: (b, _Z)),
            pl.BlockSpec(bounds.shape, lambda r, b: (_Z, _Z)),
        ],
        out_specs=pl.BlockSpec((2, blkF, N), lambda r, b: (r, b, _Z)),
        interpret=interpret,
    )(u, Crow, Skrow, SkImrow, expVih, cih, cre, cim, bounds)


def _kpm_mf_asym_call(u, Crow, Skrow, expVih, cih, cre, cim, bounds,
                      shifts, blkF: int, interpret: bool):
    R, F, N = u.shape  # R = 2 B interleaved (re, im) pairs
    kernel = functools.partial(_kpm_mf_asym_kernel, shifts=shifts)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, F, N), jnp.float32),
        grid=(R // 2, F // blkF),
        in_specs=[
            pl.BlockSpec((2, blkF, N), lambda r, b: (r, b, _Z)),
            pl.BlockSpec(Crow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec(Skrow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec((1, N), lambda r, b: (_Z, _Z)),
            pl.BlockSpec((1, N), lambda r, b: (_Z, _Z)),
            pl.BlockSpec((blkF, cre.shape[-1]), lambda r, b: (b, _Z)),
            pl.BlockSpec((blkF, cim.shape[-1]), lambda r, b: (b, _Z)),
            pl.BlockSpec(bounds.shape, lambda r, b: (_Z, _Z)),
        ],
        out_specs=pl.BlockSpec((2, blkF, N), lambda r, b: (r, b, _Z)),
        interpret=interpret,
    )(u, Crow, Skrow, expVih, cih, cre, cim, bounds)


def _kpm_mf_call(u, Crow, Skrow, expVih, cih, coefs, bounds,
                 shifts, blkF: int, cR: int, interpret: bool):
    R, F, N = u.shape
    kernel = functools.partial(_kpm_mf_kernel, shifts=shifts)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, F, N), jnp.float32),
        grid=(R // cR, F // blkF),
        in_specs=[
            pl.BlockSpec((cR, blkF, N), lambda r, b: (r, b, _Z)),
            pl.BlockSpec(Crow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec(Skrow.shape, lambda r, b: (_Z, _Z)),
            pl.BlockSpec((1, N), lambda r, b: (_Z, _Z)),
            pl.BlockSpec((1, N), lambda r, b: (_Z, _Z)),
            pl.BlockSpec((blkF, coefs.shape[-1]), lambda r, b: (b, _Z)),
            pl.BlockSpec(bounds.shape, lambda r, b: (_Z, _Z)),
        ],
        out_specs=pl.BlockSpec((cR, blkF, N), lambda r, b: (r, b, _Z)),
        interpret=interpret,
    )(u, Crow, Skrow, expVih, cih, coefs, bounds)


class KPMMFPlan:
    """Static plan for the fused matrix-free KPM apply (one per
    KPMPreconditioner structure): frequency sort permutation, block sizes,
    roll-class decomposition."""

    def __init__(self, perm_sort, inv_perm_sort, shifts, masks, blkF, cR, interpret,
                 symmetric=True, complex_hops=False):
        self.perm_sort = perm_sort
        self.inv_perm_sort = inv_perm_sort
        self.shifts = shifts
        self.masks = masks
        self.blkF = blkF
        self.cR = cR
        self.interpret = interpret
        self.symmetric = symmetric
        self.complex_hops = complex_hops


def fused_kpm_mode() -> Optional[str]:
    """Trace-time gate: 'compiled' on TPU, 'interpret' when
    SMOQY_FUSED_KPM=interpret (CPU testing), None when disabled
    (SMOQY_FUSED_KPM=0 or non-TPU backend). SMOQY_FUSED_CG=0 also disables
    (one switch kills every fused kernel)."""
    import os

    if os.environ.get("SMOQY_FUSED_CG") == "0":
        return None
    mode = os.environ.get("SMOQY_FUSED_KPM", "auto")
    if mode == "0":
        return None
    if mode == "interpret":
        return "interpret"
    return "compiled" if jax.default_backend() == "tpu" else None


def build_kpm_mf_plan(caps: np.ndarray, partner: np.ndarray, Ltau: int, N: int,
                      C_pad: int, interpret: bool,
                      symmetric: bool = True,
                      complex_hops: bool = False) -> Optional[KPMMFPlan]:
    """Static plan, or None when the lattice has no small roll-class
    decomposition or the working set cannot fit VMEM at any block size."""
    if not _HAS_PALLAS:
        return None
    cls = shift_classes(partner)
    if cls is None:
        return None
    shifts, masks = cls
    n_cls_total = sum(len(s) for s in shifts)
    perm_sort = np.argsort(-caps, kind="stable").astype(np.int32)
    inv_perm_sort = np.argsort(perm_sort).astype(np.int32)
    cR = 2
    # live planes per grid step: u + out (double-buffered: 4) + while-carry
    # t_prev/t_cur/y (3) + applyBp temp (1); tables are (N,) rows. The asym
    # and complex kernels additionally hold the pass-1 output + a second
    # coefficient table across their two in-kernel passes (the complex-sym
    # kernel is one pass but mixes rows, costing one extra live temp).
    two_pass = (not symmetric) or complex_hops
    n_state = 8 if not two_pass else 10
    n_coef_tabs = 1 if (symmetric and not complex_hops) else 2
    # complex hoppings ship an S_im plane per roll class alongside S
    n_tab_rows = len(shifts) + n_cls_total * (2 if complex_hops else 1) + 2
    blkF = 32
    while blkF > 1 and (
        Ltau % blkF != 0
        or not _fits_vmem(blkF, N, 0, 0, n_state, cR,
                          n_tab_rows * N + n_coef_tabs * blkF * C_pad)
    ):
        blkF //= 2
    if Ltau % blkF != 0 or not _fits_vmem(
        blkF, N, 0, 0, n_state, cR,
        n_tab_rows * N + n_coef_tabs * blkF * C_pad,
    ):
        return None
    return KPMMFPlan(perm_sort, inv_perm_sort, shifts, masks, blkF, cR, interpret,
                     symmetric=symmetric, complex_hops=complex_hops)


def kpm_mf_apply(plan: KPMMFPlan, bbar_cb_C, bbar_cb_S, expV, center, inv_half,
                 u_re, u_im, cre, cim, orders):
    """Fused y = sum_k c_k T_k(Bbar') u.

    Symmetric plans stack the (re, im) channels as independent rows (real
    coefficients never mix them); asymmetric plans interleave them as adjacent
    row PAIRS so each grid chunk holds one complex vector, and the kernel runs
    the two conjugate-coefficient passes internally (cim is ignored by the
    symmetric kernel). All array operands are TRACED (closure-captured device
    arrays would be re-shipped per dispatch, see build_fused_pcg). u_re/u_im
    are (..., F, N); cre/cim (F, C_pad) coefficient planes; orders (F,) i32
    live per-frequency orders (bounds the in-kernel while loops)."""
    f32 = jnp.float32
    lead = u_re.shape[:-2]
    F, N = u_re.shape[-2], u_re.shape[-1]
    perm = jnp.asarray(plan.perm_sort)
    cre_s = jnp.take(cre.astype(f32), perm, axis=0)
    n_fb = F // plan.blkF
    bounds = (
        jnp.take(orders, perm)
        .reshape(n_fb, plan.blkF)
        .max(axis=1)
        .astype(f32)[:, None]
    )
    Crow = bbar_cb_C.astype(f32)
    Skrow = jnp.concatenate(
        [bbar_cb_S[c].astype(f32) * jnp.asarray(plan.masks[c])
         for c in range(len(plan.shifts))]
    )
    expVih = (expV.astype(f32) * inv_half.astype(f32))[None, :]
    cih = jnp.broadcast_to((center * inv_half).astype(f32), (1, N))

    if not plan.symmetric:
        # interleave (re, im) as adjacent pairs: chunk r holds one vector
        ur = u_re.reshape((-1, F, N)).astype(f32)
        ui = u_im.reshape((-1, F, N)).astype(f32)
        u = jnp.stack([ur, ui], axis=1).reshape((-1, F, N))
        u_s = jnp.take(u, perm, axis=-2)
        cim_s = jnp.take(cim.astype(f32), perm, axis=0)
        y_s = _kpm_mf_asym_call(
            u_s, Crow, Skrow, expVih, cih, cre_s, cim_s, bounds,
            shifts=plan.shifts, blkF=plan.blkF, interpret=plan.interpret,
        )
        y = jnp.take(y_s, jnp.asarray(plan.inv_perm_sort), axis=-2)
        y = y.reshape((-1, 2, F, N))
        return (
            y[:, 0].reshape(lead + (F, N)),
            y[:, 1].reshape(lead + (F, N)),
        )

    u = jnp.stack([u_re, u_im]).reshape((-1, F, N)).astype(f32)
    R = u.shape[0]
    if R % plan.cR != 0:  # odd row counts: pad one zero row
        u = jnp.concatenate([u, jnp.zeros((1, F, N), f32)])
    u_s = jnp.take(u, perm, axis=-2)
    y_s = _kpm_mf_call(
        u_s, Crow, Skrow, expVih, cih, cre_s, bounds,
        shifts=plan.shifts, blkF=plan.blkF, cR=plan.cR, interpret=plan.interpret,
    )
    y = jnp.take(y_s, jnp.asarray(plan.inv_perm_sort), axis=-2)[:R]
    y = y.reshape((2,) + lead + (F, N))
    return y[0], y[1]


def kpm_mf_cplx_apply(plan: KPMMFPlan, bbar_cb_C, bbar_cb_S, bbar_cb_S_im, expV,
                      center, inv_half, w, cre, cim, orders):
    """Fused KPM apply for COMPLEX-HOPPING factorizations.

    w is (..., 2, F, N): the (re, im) channel pair of the complex
    frequency-space field at axis -3 (the layout the channel-mixing
    checkerboard expects, ops/checkerboard.py). Pairs are interleaved as
    adjacent row chunks so each grid step holds one complex vector; the kernel
    runs the symmetric single pass or the asymmetric two conjugate passes
    internally. All operands traced (see kpm_mf_apply)."""
    f32 = jnp.float32
    lead = w.shape[:-3]
    F, N = w.shape[-2], w.shape[-1]
    perm = jnp.asarray(plan.perm_sort)
    cre_s = jnp.take(cre.astype(f32), perm, axis=0)
    cim_s = jnp.take(cim.astype(f32), perm, axis=0)
    n_fb = F // plan.blkF
    bounds = (
        jnp.take(orders, perm)
        .reshape(n_fb, plan.blkF)
        .max(axis=1)
        .astype(f32)[:, None]
    )
    n_colors = len(plan.shifts)
    Crow = bbar_cb_C.astype(f32)
    Skrow = jnp.concatenate(
        [bbar_cb_S[c].astype(f32) * jnp.asarray(plan.masks[c]) for c in range(n_colors)]
    )
    SkImrow = jnp.concatenate(
        [bbar_cb_S_im[c].astype(f32) * jnp.asarray(plan.masks[c]) for c in range(n_colors)]
    )
    expVih = (expV.astype(f32) * inv_half.astype(f32))[None, :]
    cih = jnp.broadcast_to((center * inv_half).astype(f32), (1, N))

    u = w.reshape((-1, 2, F, N)).astype(f32).reshape((-1, F, N))  # interleaved pairs
    u_s = jnp.take(u, perm, axis=-2)
    y_s = _kpm_mf_cplx_call(
        u_s, Crow, Skrow, SkImrow, expVih, cih, cre_s, cim_s, bounds,
        shifts=plan.shifts, blkF=plan.blkF, symmetric=plan.symmetric,
        interpret=plan.interpret,
    )
    y = jnp.take(y_s, jnp.asarray(plan.inv_perm_sort), axis=-2)
    return y.reshape(lead + (2, F, N))
