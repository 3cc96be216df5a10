"""Newton-system strategies: how the solver factors and solves JtJ.

The reference hardwires two backends — CHOLMOD sparse Cholesky and LAPACK
packed dense Cholesky — selected by solve_type (reference dogleg.c:634-908).
Here the Gauss-Newton system is a *strategy object*: the trust-region driver
only ever needs two operations on whatever representation Products.JtJ
carries,

    quad_form(JtJ, v)                    == norm2(J v)
    gauss_newton(JtJ, Jt_x, lam, ...)    == solve (JtJ + lam I) u = Jt_x; -u

so structured representations (Schur-complement BA systems, block-sparse
factors) plug in without touching the driver. All strategies preserve the
reference's permanent escalating-lambda semantics (dogleg.c:137-138,
670-676).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from libdogleg_tpu.ops import cholesky as chol


class GNResult(NamedTuple):
    step: jnp.ndarray     # (Nstate,) the negated Newton solution
    norm2_step: jnp.ndarray
    lam: jnp.ndarray      # possibly escalated permanent lambda
    ok: jnp.ndarray       # factorization succeeded


@dataclasses.dataclass(frozen=True)
class DenseNewtonSolver:
    """Default: JtJ is a dense (Nstate, Nstate) symmetric matrix
    (the reference's LAPACK path, generalized to the sparse path too since
    the BCSR adapter materializes dense JtJ for moderate Nstate)."""

    def quad_form(self, JtJ, v):
        return jnp.dot(v, jnp.matmul(JtJ, v,
                                     preferred_element_type=JtJ.dtype))

    def gauss_newton(self, JtJ, Jt_x, lam, *, lambda_initial,
                     lambda_max_tries) -> GNResult:
        fac = chol.factorize_jtj(JtJ, lam, lambda_initial=lambda_initial,
                                 lambda_max_tries=lambda_max_tries)
        step, n2 = chol.gauss_newton_step(fac.L, Jt_x)
        return GNResult(step=step, norm2_step=n2, lam=fac.lam, ok=fac.ok)


# BlockedDenseNewtonSolver wins for BATCHED mid-size Nstate (17..256);
# batched_optimize auto-selects it there (parallel/batched.py).
BLOCKED_MIN_N = 17
BLOCKED_MAX_N = 256


@dataclasses.dataclass(frozen=True)
class BlockedDenseNewtonSolver:
    """Dense JtJ through the 16-block-panel Cholesky (ops/blockchol.py).

    The mid-size BATCHED regime (Nstate 17..256, thousands of vmapped
    instances): XLA's lax.linalg lowering costs 4.85 ms for a (512, 64, 64)
    f32 factorization where the blocked-panel form costs ~180 us (26x), by
    keeping the O(n^3) work on the MXU and the per-column recurrences as
    unrolled flat VPU DAGs. Trade-off: trace-time unrolling grows compile
    time with Nstate (tens of seconds at Nstate=128) — right for production
    batched solves, wrong for one-off single solves, hence a separate
    strategy rather than a new factorize_jtj default."""

    def quad_form(self, JtJ, v):
        return jnp.dot(v, jnp.matmul(JtJ, v,
                                     preferred_element_type=JtJ.dtype))

    def gauss_newton(self, JtJ, Jt_x, lam, *, lambda_initial,
                     lambda_max_tries) -> GNResult:
        from libdogleg_tpu.ops import blockchol

        n = JtJ.shape[-1]
        eye = jnp.eye(n, dtype=JtJ.dtype)

        def try_factor(lm):
            L, ok = blockchol.blocked_cholesky(JtJ + lm * eye)
            return L, jnp.all(ok)

        L, lam, ok = chol.escalating_lambda(
            try_factor, lam, JtJ.dtype, lambda_initial=lambda_initial,
            lambda_max_tries=lambda_max_tries)
        step = -blockchol.blocked_cho_solve(L, Jt_x)
        return GNResult(step=step, norm2_step=jnp.dot(step, step),
                        lam=lam, ok=ok)


class SchurJtJ(NamedTuple):
    """BA-style arrow-structured Gauss-Newton system.

    State layout: p = [dense block (nc params) | np point blocks of size bs],
    Nstate = nc + np*bs. JtJ = [[U, W], [W^T, V]] with V block-diagonal —
    the classic bundle-adjustment structure (SURVEY.md section 5.7;
    BASELINE.md config 4). No reference equivalent: libdogleg hands such
    systems whole to CHOLMOD.
    """
    U: jnp.ndarray         # (nc, nc) dense camera/global block
    W: jnp.ndarray         # (nc, np, bs) coupling blocks
    V: jnp.ndarray         # (np, bs, bs) point diagonal blocks


def schur_split(v: jnp.ndarray, nc: int, n_points: int, bs: int):
    return v[:nc], v[nc:].reshape(n_points, bs)


@dataclasses.dataclass(frozen=True)
class SchurNewtonSolver:
    """Gauss-Newton via Schur-complement elimination of the point blocks.

    factorize: Vhat_i = V_i + lam I (vmapped small Cholesky, MXU/VPU
    friendly); S = U + lam I - sum_i W_i Vhat_i^{-1} W_i^T (one batched
    einsum); dense Cholesky of S.
    solve:     y_i = Vhat_i^{-1} rp_i; dc = S^{-1}(rc - sum_i W_i y_i);
               dp_i = Vhat_i^{-1}(rp_i - W_i^T dc).

    This keeps only nc^2 + np*bs^2 state resident instead of Nstate^2 and
    turns the factorization into batched small blocks + one small dense
    factor — the TPU shape for BA problems.
    """
    nc: int
    n_points: int
    block_size: int
    # Point-block factor/solve backend for block_size <= 16:
    #   "unrolled" (default) — smallchol flat VPU DAGs. Measured wins:
    #     (20000, 3, 3) chol 9.4 us vs 6832 us lax (727x); linear-BA
    #     latency 17 -> 2.9 ms; pinhole-BA 91 ms vs 161 ms lax.
    #   "lax" — lax.linalg, kept as an escape hatch: when a SLOW products
    #     evaluation dominated the pinhole-BA loop (the old scatter-based
    #     assembly), the unrolled DAG scheduled badly against it and lax
    #     measured faster (1.69 vs 1.98 s) — if a model's solve regresses
    #     with the default, A/B this flag.
    # block_size > 16 always uses lax.
    point_solver: str = "unrolled"

    def quad_form(self, JtJ: SchurJtJ, v):
        vc, vp = schur_split(v, self.nc, self.n_points, self.block_size)
        uv = jnp.dot(vc, jnp.matmul(JtJ.U, vc,
                                    preferred_element_type=vc.dtype))
        wv = jnp.einsum('cpb,pb->c', JtJ.W, vp,
                        preferred_element_type=vc.dtype)
        vv = jnp.einsum('pb,pbk,pk->', vp, JtJ.V, vp,
                        preferred_element_type=vc.dtype)
        return uv + 2.0 * jnp.dot(vc, wv) + vv

    def factor(self, JtJ: SchurJtJ, lam):
        """Factorize JtJ + lam*I once at a FIXED lambda (no escalation).

        Returns ((Lv, Ls), ok): Lv (np, bs, bs) lower Cholesky factors of
        the damped point blocks, Ls (nc, nc) lower Cholesky factor of the
        Schur complement S, ok scalar bool. This is the public
        cached-factorization handle: analysis passes (outlierness,
        query-point confidence) recompute the solve's factorization once
        via this method and share it across queries — the reference's
        reuse-or-recompute semantics (dogleg.c:2636-2652) without keeping
        mutable factor state inside SolveResult. The tuple layout is a
        stable contract (used by analysis.get_outlierness_factors_ba)."""
        from libdogleg_tpu.ops import smallchol

        bs = self.block_size
        eye_b = jnp.eye(bs, dtype=JtJ.V.dtype)
        Vhat = JtJ.V + lam * eye_b
        Wt = jnp.transpose(JtJ.W, (1, 2, 0))            # (np, bs, nc)
        if bs <= smallchol.SMALL_N_MAX and self.point_solver == "unrolled":
            # batched tiny blocks: XLA's lax.linalg lowering is the wrong
            # regime by orders of magnitude (measured (20000, 3, 3):
            # 6832 us chol / 483 us trisolve vs 9.4 us / 88 us unrolled)
            Lv, okb = smallchol.small_cholesky(Vhat)    # (np, bs, bs)
            ok_v = jnp.all(okb)
            Y = smallchol.small_cho_solve_mat(Lv, Wt)
        else:
            Lv = jnp.linalg.cholesky(Vhat)
            ok_v = jnp.all(jnp.isfinite(Lv)) & jnp.all(
                jnp.diagonal(Lv, axis1=-2, axis2=-1) > 0)
            # Vhat^{-1} W^T via batched triangular solves per point block.
            Y = jax.lax.linalg.triangular_solve(Lv, Wt, left_side=True,
                                                lower=True)
            Y = jax.lax.linalg.triangular_solve(Lv, Y, left_side=True,
                                                lower=True,
                                                transpose_a=True)
        # S = U + lam I - sum_p W_p Vhat_p^{-1} W_p^T
        S = (JtJ.U + lam * jnp.eye(self.nc, dtype=JtJ.U.dtype)
             - jnp.einsum('cpb,pbd->cd', JtJ.W, Y,
                          preferred_element_type=JtJ.U.dtype))
        Ls = jnp.linalg.cholesky(S)
        ok_s = jnp.all(jnp.isfinite(Ls)) & jnp.all(jnp.diag(Ls) > 0)
        return (Lv, Ls), ok_v & ok_s

    def _gn_core(self, JtJ: SchurJtJ, rc, rp, lam, lambda_initial,
                 lambda_max_tries):
        """Factor (with the escalating-lambda loop) and solve for the
        camera/point step pair (dc, dp)."""
        (Lv, Ls), lam, ok = chol.escalating_lambda(
            lambda lm: self.factor(JtJ, lm), lam, rc.dtype,
            lambda_initial=lambda_initial,
            lambda_max_tries=lambda_max_tries)

        from libdogleg_tpu.ops import smallchol

        def vsolve(b):
            # (np, bs, k) batched solve with the point-block factors
            if (self.block_size <= smallchol.SMALL_N_MAX
                    and self.point_solver == "unrolled"):
                return smallchol.small_cho_solve_mat(Lv, b)
            y = jax.lax.linalg.triangular_solve(Lv, b, left_side=True,
                                                lower=True)
            return jax.lax.linalg.triangular_solve(Lv, y, left_side=True,
                                                   lower=True,
                                                   transpose_a=True)

        y = vsolve(rp[..., None])[..., 0]               # (np, bs)
        rhs_c = rc - jnp.einsum('cpb,pb->c', JtJ.W, y,
                                preferred_element_type=rc.dtype)
        dc = chol.cholesky_solve(Ls, rhs_c)
        rp2 = rp - jnp.einsum('cpb,c->pb', JtJ.W, dc,
                              preferred_element_type=rc.dtype)
        dp = vsolve(rp2[..., None])[..., 0]
        return dc, dp, lam, ok

    def gauss_newton(self, JtJ: SchurJtJ, Jt_x, lam, *, lambda_initial,
                     lambda_max_tries) -> GNResult:
        rc, rp = schur_split(Jt_x, self.nc, self.n_points, self.block_size)
        dc, dp, lam, ok = self._gn_core(JtJ, rc, rp, lam, lambda_initial,
                                        lambda_max_tries)
        step = -jnp.concatenate([dc, dp.reshape(-1)])
        return GNResult(step=step, norm2_step=jnp.dot(step, step),
                        lam=lam, ok=ok)


@dataclasses.dataclass(frozen=True)
class TreeSchurNewtonSolver(SchurNewtonSolver):
    """SchurNewtonSolver over structured pytree states
    {"c": (nc,), "q": (n_points, bs)} instead of one flat vector.

    The point of the structure: each leaf carries its OWN mesh sharding, so
    the camera block stays replicated while the point states/gradients/
    steps shard over a "pts" mesh axis together with the SchurJtJ W/V
    blocks — GSPMD then keeps the whole solve distributed (per-point work
    local, one all-reduce for the nc-sized reduced system per
    factorization). A flat (nc + np*bs,) vector cannot express that mixed
    sharding, which is why solver states are pytrees (SURVEY.md section
    2.2: row-block partitioning + Schur elimination via collectives)."""

    def quad_form(self, JtJ: SchurJtJ, v):
        vc, vp = v["c"], v["q"]
        uv = jnp.dot(vc, jnp.matmul(JtJ.U, vc,
                                    preferred_element_type=vc.dtype))
        wv = jnp.einsum('cpb,pb->c', JtJ.W, vp,
                        preferred_element_type=vc.dtype)
        vv = jnp.einsum('pb,pbk,pk->', vp, JtJ.V, vp,
                        preferred_element_type=vc.dtype)
        return uv + 2.0 * jnp.dot(vc, wv) + vv

    def gauss_newton(self, JtJ: SchurJtJ, Jt_x, lam, *, lambda_initial,
                     lambda_max_tries) -> GNResult:
        dc, dp, lam, ok = self._gn_core(JtJ, Jt_x["c"], Jt_x["q"], lam,
                                        lambda_initial, lambda_max_tries)
        step = {"c": -dc, "q": -dp}
        n2 = jnp.dot(dc, dc) + jnp.sum(dp * dp)
        return GNResult(step=step, norm2_step=n2, lam=lam, ok=ok)


@dataclasses.dataclass(frozen=True)
class SparseNewtonSolver:
    """General block-sparse Gauss-Newton systems via the level-scheduled
    block-sparse Cholesky (libdogleg_tpu.sparse_cholesky) — the CHOLMOD
    replacement for patterns that are neither dense nor arrow-structured.

    Products.JtJ is the (n_input_blocks, b, b) tensor of stored
    lower-triangle blocks in the pattern this strategy was analyzed for.
    The symbolic analysis (fill + level schedules) happens once at
    construction, mirroring the reference's single cholmod_analyze
    (dogleg.c:649-654).
    """
    symbolic: "object"  # SparseCholeskySymbolic (kept loose to avoid cycle)

    @staticmethod
    def analyze(rows, cols, nb: int, b: int = 1,
                ordering=None,
                amalgamate: int = 1) -> "SparseNewtonSolver":
        """amalgamate > 1 merges that many consecutive (post-ordering)
        block columns into supernodes (libdogleg_tpu.supernodal): fewer,
        fatter dependency levels — the MXU-friendly regime for small b.

        ordering defaults to the right companion of the factorization
        style: "mindeg" (fill-minimizing) for the simplicial path, "rcm"
        (bandwidth-minimizing, keeps grouped supernodes banded) when
        amalgamating — minimum degree scatters structurally-related
        columns and makes fixed-width grouping couple distant nodes
        (measured 7x regression)."""
        if ordering is None:
            ordering = "rcm" if amalgamate > 1 else "mindeg"
        if amalgamate > 1:
            from libdogleg_tpu import supernodal as sn
            return SparseNewtonSolver(
                symbolic=sn.analyze(rows, cols, nb, b, ordering,
                                    amalgamate=amalgamate))
        from libdogleg_tpu import sparse_cholesky as sc
        return SparseNewtonSolver(
            symbolic=sc.analyze(rows, cols, nb, b, ordering))

    def _backend(self):
        if hasattr(self.symbolic, "inner"):
            from libdogleg_tpu import supernodal as sn
            return sn
        from libdogleg_tpu import sparse_cholesky as sc
        return sc

    def quad_form(self, blocks, v):
        # works for both symbolic kinds: in_rows/in_cols/nb/b are the
        # ORIGINAL pattern on either
        sym = self.symbolic
        b = sym.b
        vb = v.reshape(sym.nb, b)
        vi = vb[jnp.asarray(sym.in_rows)]
        vj = vb[jnp.asarray(sym.in_cols)]
        per_block = jnp.einsum('ka,kab,kb->k', vi, blocks, vj,
                               preferred_element_type=v.dtype)
        offdiag = jnp.asarray((sym.in_rows != sym.in_cols).astype(np.int8))
        weight = jnp.where(offdiag == 1, 2.0, 1.0).astype(v.dtype)
        return jnp.sum(per_block * weight)

    def gauss_newton(self, blocks, Jt_x, lam, *, lambda_initial,
                     lambda_max_tries) -> GNResult:
        be = self._backend()
        L, lam, ok = be.factorize_with_lambda(
            self.symbolic, blocks, lam, lambda_initial=lambda_initial,
            lambda_max_tries=lambda_max_tries)
        step = -be.solve(self.symbolic, L, Jt_x)
        return GNResult(step=step, norm2_step=jnp.dot(step, step),
                        lam=lam, ok=ok)


def schur_to_dense(JtJ: SchurJtJ) -> jnp.ndarray:
    """Densify the arrow structure (test oracle helper)."""
    nc = JtJ.U.shape[0]
    n_points, bs, _ = JtJ.V.shape
    n = nc + n_points * bs
    out = jnp.zeros((n, n), JtJ.U.dtype)
    out = out.at[:nc, :nc].set(JtJ.U)
    W = JtJ.W.reshape(nc, n_points * bs)
    out = out.at[:nc, nc:].set(W)
    out = out.at[nc:, :nc].set(W.T)
    Vd = jax.scipy.linalg.block_diag(*[JtJ.V[i] for i in range(n_points)])
    return out.at[nc:, nc:].set(Vd)


class SparseWSchurJtJ(NamedTuple):
    """Arrow system with SPARSE camera-point coupling: the realistic
    bundle-adjustment regime where each point is observed by only k_obs of
    the cameras. The dense SchurJtJ.W is (nc, np, bs) — 460 MB at
    ncam=128/np=50000/bs=3 — while only k_obs blocks per point are
    nonzero; this form stores exactly those.

    No reference equivalent (libdogleg hands BA systems whole to CHOLMOD);
    the TPU design rule here is scatter-free consumption: every
    camera-axis reduction is a one-hot MXU einsum and every camera-axis
    broadcast is a gather (TPU scatters serialize; measured 46 ms to
    scatter-assemble a dense W this size — models/pinhole_ba.py history).
    """
    U: jnp.ndarray        # (nc, nc) dense camera block (nc = ncam * cb)
    Wv: jnp.ndarray       # (np, k_obs, cb, bs) nonzero W blocks, point-major
    cam_of: jnp.ndarray   # (np, k_obs) int32: which camera each block couples
    V: jnp.ndarray        # (np, bs, bs) point diagonal blocks


@dataclasses.dataclass(frozen=True)
class SparseWSchurNewtonSolver:
    """Schur elimination of the point blocks for SparseWSchurJtJ, over
    pytree states {"c": (nc,), "q": (np, bs)} (the TreeSchurNewtonSolver
    state convention).

    The reduced system S = U + lam I - sum_p W_p Vhat_p^{-1} W_p^T is
    assembled as S = U + lam I - sum_p F_p F_p^T with
    F[p, c*cb+i, j] = sum_k onehot(cam_of[p,k], c) * (Wv[p,k] Lv_p^{-T})
    — one one-hot contraction and one batched matmul, no scatter. All
    solve-phase camera reductions/broadcasts are one-hot einsums/gathers.
    Escalating-lambda semantics identical to the other strategies.
    """
    nc: int
    n_points: int
    block_size: int
    k_obs: int
    cam_block: int = 6
    # S-assembly single-pass threshold in F elements (~64 MB f32); above
    # it the reduced system accumulates over point chunks (see
    # factor()). Tests shrink it to force the chunked path.
    s_chunk_limit: int = 1 << 24

    @property
    def ncam(self) -> int:
        return self.nc // self.cam_block

    def _onehot(self, cam_of, dtype):
        # (np, k_obs, ncam) {0,1} selector; built from iota comparison
        return (cam_of[..., None]
                == jnp.arange(self.ncam, dtype=cam_of.dtype)).astype(dtype)

    def _cam_reduce(self, JtJ, vals):
        return onehot_cam_reduce(JtJ.cam_of, vals, self.ncam,
                                 chunk_limit=self.s_chunk_limit
                                 ).reshape(self.nc)

    def quad_form(self, JtJ: SparseWSchurJtJ, v):
        vc, vp = v["c"], v["q"]
        dt = vc.dtype
        uv = jnp.dot(vc, jnp.matmul(JtJ.U, vc, preferred_element_type=dt))
        # vc^T W vp: gather each block's camera slice of vc
        vcg = vc.reshape(self.ncam, self.cam_block)[JtJ.cam_of]
        wv = jnp.einsum('pki,pkij,pj->', vcg, JtJ.Wv, vp,
                        preferred_element_type=dt)
        vv = jnp.einsum('pb,pbk,pk->', vp, JtJ.V, vp,
                        preferred_element_type=dt)
        return uv + 2.0 * wv + vv

    def factor(self, JtJ: SparseWSchurJtJ, lam):
        """Factorize JtJ + lam*I once at a FIXED lambda (no escalation).

        Returns ((Lv, Ls), ok) — same public contract as
        SchurNewtonSolver.factor (point-block Cholesky factors + reduced
        camera-system factor); see that docstring for the reuse semantics."""
        from libdogleg_tpu.ops import smallchol

        dt = JtJ.U.dtype
        bs = self.block_size
        Vhat = JtJ.V + lam * jnp.eye(bs, dtype=dt)
        Lv, okb = smallchol.small_cholesky(Vhat)        # (np, bs, bs)
        ok_v = jnp.all(okb)
        # B[p,k] = Wv[p,k] Lv_p^{-T}: solve Lv Y = Wv^T per block, with Lv
        # broadcast over the k_obs axis (the unrolled substitution helper
        # broadcasts its batch dims)
        B = jnp.swapaxes(
            smallchol.small_fwd_solve_mat(
                Lv[:, None], jnp.swapaxes(JtJ.Wv, -1, -2)), -1, -2)
        # S = U + lam I - sum_p F_p F_p^T with
        # F[p, c*cb+i, j] = sum_k onehot(cam_of[p,k], c) B[p,k,i,j].
        # F materialized whole would be (np, nc, bs) — the SAME size as the
        # dense W this representation exists to avoid (460 MB at the
        # config-7s scale) — so accumulate S over point chunks instead:
        # each chunk's F is bounded, total FLOPs unchanged.
        S0 = JtJ.U + lam * jnp.eye(self.nc, dtype=dt)
        limit = self.s_chunk_limit
        if self.n_points * self.nc * bs <= limit:
            E = self._onehot(JtJ.cam_of, dt)
            F = jnp.einsum('pkc,pkij->pcij', E, B,
                           preferred_element_type=dt)
            F = F.reshape(self.n_points, self.nc, bs)
            S = S0 - jnp.einsum('pcj,pdj->cd', F, F,
                                preferred_element_type=dt)
        else:
            chunk = max(1, limit // (self.nc * bs))
            nchunks = -(-self.n_points // chunk)
            npad = nchunks * chunk - self.n_points
            Bp = jnp.pad(B, ((0, npad), (0, 0), (0, 0), (0, 0)))
            # padded blocks are zero, so their one-hot target is harmless
            cam_p = jnp.pad(JtJ.cam_of, ((0, npad), (0, 0)))

            def body(S, i):
                Bc = jax.lax.dynamic_slice_in_dim(Bp, i * chunk, chunk)
                cc = jax.lax.dynamic_slice_in_dim(cam_p, i * chunk, chunk)
                Ec = self._onehot(cc, dt)
                Fc = jnp.einsum('pkc,pkij->pcij', Ec, Bc,
                                preferred_element_type=dt)
                Fc = Fc.reshape(chunk, self.nc, bs)
                return S - jnp.einsum('pcj,pdj->cd', Fc, Fc,
                                      preferred_element_type=dt), None

            S, _ = jax.lax.scan(body, S0, jnp.arange(nchunks))
        Ls = jnp.linalg.cholesky(S)
        ok_s = jnp.all(jnp.isfinite(Ls)) & jnp.all(jnp.diag(Ls) > 0)
        return (Lv, Ls), ok_v & ok_s

    def gauss_newton(self, JtJ: SparseWSchurJtJ, Jt_x, lam, *,
                     lambda_initial, lambda_max_tries) -> GNResult:
        from libdogleg_tpu.ops import smallchol

        rc, rp = Jt_x["c"], Jt_x["q"]
        dt = rc.dtype
        (Lv, Ls), lam, ok = chol.escalating_lambda(
            lambda lm: self.factor(JtJ, lm), lam, dt,
            lambda_initial=lambda_initial,
            lambda_max_tries=lambda_max_tries)

        def vsolve(b):                                   # (np, bs)
            return smallchol.small_cho_solve_mat(Lv, b[..., None])[..., 0]

        y = vsolve(rp)
        wy = self._cam_reduce(JtJ, jnp.einsum(
            'pkij,pj->pki', JtJ.Wv, y, preferred_element_type=dt))
        dc = chol.cholesky_solve(Ls, rc - wy)
        dcg = dc.reshape(self.ncam, self.cam_block)[JtJ.cam_of]
        rp2 = rp - jnp.einsum('pkij,pki->pj', JtJ.Wv, dcg,
                              preferred_element_type=dt)
        dp = vsolve(rp2)
        step = {"c": -dc, "q": -dp}
        n2 = jnp.dot(dc, dc) + jnp.sum(dp * dp)
        return GNResult(step=step, norm2_step=n2, lam=lam, ok=ok)


def onehot_cam_reduce(cam_of, vals, ncam: int,
                      chunk_limit: int = 1 << 24):
    """Scatter-free segment reduction over the camera axis:
    out[c] = sum over (p, k) with cam_of[p, k] == c of vals[p, k],
    for vals (np, k_obs, ...trailing). Implemented as a one-hot MXU
    einsum (TPU scatters serialize), processed in point chunks so the
    (np, k_obs, ncam) selector never materializes whole (410 MB at
    np=200000, ncam=128). Shared by SparseWSchurNewtonSolver and the
    sparse-visibility BA products assembly."""
    dt = vals.dtype
    n_points, k_obs = cam_of.shape
    trailing = vals.shape[2:]
    v2 = vals.reshape(n_points, k_obs, -1)

    def onehot(cc):
        return (cc[..., None]
                == jnp.arange(ncam, dtype=cc.dtype)).astype(dt)

    if n_points * k_obs * ncam <= chunk_limit:
        out = jnp.einsum('pkc,pki->ci', onehot(cam_of), v2,
                         preferred_element_type=dt)
        return out.reshape((ncam,) + trailing)

    chunk = max(1, chunk_limit // (k_obs * ncam))
    nchunks = -(-n_points // chunk)
    npad = nchunks * chunk - n_points
    v_p = jnp.pad(v2, ((0, npad), (0, 0), (0, 0)))
    cam_p = jnp.pad(cam_of, ((0, npad), (0, 0)))

    def body(acc, i):
        vc = jax.lax.dynamic_slice_in_dim(v_p, i * chunk, chunk)
        cc = jax.lax.dynamic_slice_in_dim(cam_p, i * chunk, chunk)
        return acc + jnp.einsum('pkc,pki->ci', onehot(cc), vc,
                                preferred_element_type=dt), None

    acc, _ = jax.lax.scan(body,
                          jnp.zeros((ncam, v2.shape[-1]), dt),
                          jnp.arange(nchunks))
    return acc.reshape((ncam,) + trailing)
