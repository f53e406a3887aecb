"""Distributed full-spectrum symmetric eigensolver (QDWH-eig style).

Parity: Matrix::eigenDecomposition -> pdsyev_ (matrix.cpp:3327-3380) at
sizes where gathering the N x N operand to one device is impossible.
The reference gets a cooperative full-spectrum solve from ScaLAPACK;
XLA's native eigh on a sharded operand all-gathers it per device, so
beyond-HBM N needs a genuinely distributed algorithm.

TPU-first design — spectral divide-and-conquer via the matrix sign
function (Nakatsukasa & Higham's QDWH-eig recast for a row-sharded
mesh).  Everything is matmuls, Cholesky factorizations and triangular
solves, the three primitives the MXU + our shard_map kernels
(linalg/distributed.py) already do at scale:

  1. pick a split point sigma (median of the diagonal);
  2. U = sign(A - sigma I) via QDWH dynamically-weighted rational
     iterations: X <- (b/c) X + (a - b/c) X (I + c X^2)^{-1}, each step
     one sharded symmetric matmul + one sharded SPD solve, followed by
     Newton-Schulz polishing X <- X (3 I - X^2) / 2 — all MXU work;
  3. the projectors (I -/+ U)/2 split the spectrum; ranks come from
     trace(U); invariant-subspace bases via randomized range finding
     orthonormalized with CholeskyQR2 (again: matmuls + small Cholesky);
  4. recurse on the Rayleigh quotients Q^T A Q until subproblems fit a
     single device, then jnp.linalg.eigh locally.

The QDWH coefficient schedule is computed on host from the scalar l0
(relative lower bound on |eig(A) - sigma| / alpha), so the device loop
has a fixed trip count (jit/scan friendly).  Padding to the mesh's
divisibility requirement appends exact +1 fixed points of the rational
map (f(1) = (a+b)/(1+c) = 1 since c = a+b-1), so padded rows never
contaminate the spectrum.

Accuracy note: run in float64 on CPU meshes / for parity tests; on TPU
use float32 with a looser l0 — the sign function only needs to resolve
the gap at the split point, not the full spectrum conditioning.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dissect_tpu.linalg.distributed import spd_solve_cyclic


def qdwh_coefficients(l0: float, max_iter: int = 12):
    """Host-side QDWH dynamic-weighting schedule from the lower bound l0.

    Returns the (a, b, c) list; the map x -> x (a + b x^2)/(1 + c x^2)
    drives |x| in [l0, 1] to 1 cubically (~6 steps for l0 = 1e-16)."""
    coeffs = []
    l = float(min(max(l0, 1e-16), 1.0))
    while len(coeffs) < max_iter:
        d = (4.0 * (1.0 - l * l) / (l ** 4)) ** (1.0 / 3.0)
        a = math.sqrt(1.0 + d) + 0.5 * math.sqrt(
            max(8.0 - 4.0 * d + 8.0 * (2.0 - l * l) / (l * l * math.sqrt(1.0 + d)), 0.0)
        )
        b = (a - 1.0) ** 2 / 4.0
        c = a + b - 1.0
        coeffs.append((a, b, c))
        l = l * (a + b * l * l) / (1.0 + c * l * l)
        if abs(1.0 - l) < 1e-14:
            break
    return coeffs


def _pad_spd(x, target, diag):
    """Embed x in a (target, target) block with `diag` on the padding."""
    n = x.shape[0]
    if target == n:
        return x
    out = jnp.zeros((target, target), x.dtype)
    out = out.at[:n, :n].set(x)
    idx = jnp.arange(n, target)
    return out.at[idx, idx].set(diag)


@partial(jax.jit, static_argnames=("mesh", "axis", "block", "ns_iters"))
def _sign_padded(x, coeffs_arr, mesh, axis, block, ns_iters):
    """sign(X) for symmetric X already padded to the mesh divisibility.

    One lax.scan step = X^2 (sharded matmul) + SPD solve of
    (I + c X^2) Y = X via the distributed blocked Cholesky; then
    `ns_iters` Newton-Schulz polish steps.  A 1-device mesh uses XLA's
    native fused Cholesky/triangular solves — the blocked shard_map
    solve's sequential panel rounds are pure latency there."""
    n = x.shape[0]
    # TPU fp32 matmuls default to fast bf16 passes; the sign iteration
    # tolerates that, but downstream projectors/bases do not — measured
    # O(1) eigenvalue errors on clustered spectra.  Trace the whole
    # solver at HIGHEST precision (6-pass bf16 = true fp32).
    spec = None
    if mesh is not None and mesh.shape[axis] > 1:
        spec = NamedSharding(mesh, P(axis, None))
        x = jax.lax.with_sharding_constraint(x, spec)
    eye = jnp.eye(n, dtype=x.dtype)
    prec = jax.default_matmul_precision("highest")

    def spd_solve(z, rhs):
        # XLA's fused cholesky + full-square-RHS triangular solves blow
        # up at compile beyond ~8k rows (measured v5e at n=16384: 33.5 GB
        # of dynamic-update-slice temps, an HBM compile rejection), so
        # big ONE-DEVICE solves also take the single-carry blocked
        # cyclic kernel; below that the fused solve is faster.
        if spec is None and (mesh is None or n < 8192):
            chol = jnp.linalg.cholesky(z)
            y = jax.lax.linalg.triangular_solve(
                chol, rhs, left_side=True, lower=True
            )
            return jax.lax.linalg.triangular_solve(
                chol, y, left_side=True, lower=True, transpose_a=True
            )
        out, _ = spd_solve_cyclic(z, rhs, mesh, axis, block)
        return out

    def step(x, abc):
        a, b, c = abc[0], abc[1], abc[2]
        x2 = x @ x
        z = c * x2 + eye
        y = spd_solve(z, x)
        x = (b / c) * x + (a - b / c) * y
        x = 0.5 * (x + x.T)
        if spec is not None:
            x = jax.lax.with_sharding_constraint(x, spec)
        return x, None

    def polish(_, x):
        x = 0.5 * x @ (3.0 * eye - x @ x)
        x = 0.5 * (x + x.T)
        if spec is not None:
            x = jax.lax.with_sharding_constraint(x, spec)
        return x

    with prec:
        x, _ = jax.lax.scan(step, x, coeffs_arr)
        x = jax.lax.fori_loop(0, ns_iters, polish, x)
    return x


@jax.jit
def _shift_diag(a, sigma):
    """a - sigma*I with the identity fused into the subtraction (an
    eager jnp.eye materializes a full plane per recursion level)."""
    m = a.shape[0]
    di = jnp.arange(m)
    return a.at[di, di].add(-sigma)


# Measured on the v5e AOT compiler: the vmapped 4-candidate
# _batched_split program peaks at ~121 f32 planes of m^2 at m=8192
# (32.5 GB — a guaranteed runtime kill on a 16 GB chip), ~190 planes
# at a ~5.4k uneven split (padding), ~70 planes at m=4096 (4.7 GB —
# fine).  One fused dispatch per split only pays off when it fits, so
# mid-size subproblems of a big solve route to the
# one-candidate-at-a-time sharded branch instead; the constant here is
# a conservative pre-gate and a compile-time HBM rejection of the
# batched program falls through to the sequential branch anyway.
_BATCHED_PLANES = 200


def _batched_fits(a_sub, m: int) -> bool:
    try:
        dev = a_sub.devices().pop()
    except Exception:
        return True
    if dev.platform == "cpu":
        return True  # host RAM; the CPU-mesh tests batch at toy sizes
    limit = None
    try:
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit")
    except Exception:
        limit = None
    budget = 0.95 * float(limit or 16e9)
    return _BATCHED_PLANES * m * m * a_sub.dtype.itemsize <= budget


def pick_sign_block(n: int, n_devices: int, requested: Optional[int] = None) -> int:
    """Cholesky panel width for the sign iterations' SPD solves.

    Small panels mean many fine-grained sequential rounds per solve
    (latency-bound even on one device); large panels unbalance the
    trailing updates.  Largest power of two <= n/(4*devices), clamped
    to [64, 512]."""
    if requested is not None:
        return requested
    per = max(n // max(4 * n_devices, 1), 64)
    block = 64
    while block * 2 <= min(per, 512):
        block *= 2
    return block


def matrix_sign(
    a,
    mesh: Optional[Mesh] = None,
    axis: str = "i",
    block: Optional[int] = None,
    l0: float = 1e-6,
    ns_iters: int = 2,
):
    """sign(A) of a symmetric matrix with no zero eigenvalues.

    Scale by alpha = min(frobenius, max row 1-norm) >= ||A||_2, pad to
    the mesh divisibility with +1 fixed points, run the QDWH schedule."""
    n = a.shape[0]
    block = pick_sign_block(n, mesh.shape[axis] if mesh is not None else 1, block)
    fro = jnp.linalg.norm(a)
    row1 = jnp.max(jnp.sum(jnp.abs(a), axis=1))
    alpha = jnp.minimum(fro, row1) + jnp.asarray(1e-30, a.dtype)
    x = a / alpha

    target = n
    if mesh is not None:
        q = mesh.shape[axis] * block
        target = int(-(-n // q) * q)
    x = _pad_spd(x, target, jnp.asarray(1.0, a.dtype))
    coeffs = np.asarray(qdwh_coefficients(l0), dtype=np.float64)
    u = _sign_padded(
        x,
        jnp.asarray(coeffs, dtype=a.dtype),
        mesh,
        axis,
        block,
        ns_iters,
    )
    return u[:n, :n]


@partial(jax.jit, static_argnames=("spec",))
def _cholqr2(y, spec=None):
    """Orthonormalize columns of y via two rounds of Cholesky-QR.

    Matmul-rich TSQR replacement: Gram + small Cholesky + triangular
    solve, repeated to recover orthogonality lost to squaring the
    condition number.  With `spec` the tall operand stays row-sharded;
    the (k, k) Gram and factor replicate (XLA psums the contraction)."""
    with jax.default_matmul_precision("highest"):
        return _cholqr2_body(y, spec)


def _tri_solve_right(r, y):
    """y @ r^{-T} (r lower) with the ROWS of y chunked.

    XLA's blocked triangular solve materializes several full-RHS temps
    per level: at a 16384 x 9436 basis that is ~0.6 GB apiece and the
    whole _split_apply program compiles to 21.6 GB — an HBM rejection
    (measured v5e, round 5).  Rows of a right-side solve are
    independent, so chunking them caps the temps at chunk size with no
    extra flops."""
    m = y.shape[0]
    if m <= 8192:
        return jax.lax.linalg.triangular_solve(
            r, y, left_side=False, lower=True, transpose_a=True
        )
    n_chunks = -(-m // 4096)
    pad = n_chunks * 4096 - m
    y_pad = jnp.pad(y, ((0, pad), (0, 0)))

    def body(i, out):
        i0 = (i * 4096).astype(jnp.int32)
        blk = jax.lax.dynamic_slice(
            y_pad, (i0, jnp.int32(0)), (4096, y.shape[1])
        )
        solved = jax.lax.linalg.triangular_solve(
            r, blk, left_side=False, lower=True, transpose_a=True
        )
        return jax.lax.dynamic_update_slice(out, solved, (i0, jnp.int32(0)))

    out = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros_like(y_pad)
    )
    return out[:m]


def _cholqr2_body(y, spec):
    for _ in range(2):
        gram = y.T @ y
        r = jnp.linalg.cholesky(gram)
        y = _tri_solve_right(r, y)
        if spec is not None:
            y = jax.lax.with_sharding_constraint(y, spec)
    return y


# Above this column count, the spectral-split basis is orthonormalized
# with a HOST float64 Gram Cholesky instead of pure fp32 CholeskyQR2.
# The split samples EXACTLY k Gaussian probes from a rank-k projector,
# so the basis is square-Gaussian-conditioned (kappa ~ 2k): at k~2048
# fp32 CholeskyQR2 still works, by k~6000 the fp32 Gram's smallest
# eigenvalues are pure rounding noise and the Cholesky NaNs (n=10240)
# or silently produces a deficient basis that loses ~2% of the trace
# (n=16384, both measured round 5).  The f64 Gram is accumulated on
# device with the chunk-sequenced emulated dot; only the (k, k) Gram
# crosses to the host.
_HOST_QR_K = 2560


@partial(jax.jit, static_argnames=("spec",))
def _gram_f64(y, spec=None):
    """y^T y accumulated in f64, row-chunk-sequenced (an fp32 Gram of
    a cond~2k basis cannot resolve its smallest eigenvalues; a full
    f64 cast of y would cost an extra operand-size buffer)."""
    f64 = jnp.float64
    m, k = y.shape
    step = 2048
    n_chunks = -(-m // step)
    pad = n_chunks * step - m
    y_pad = jnp.pad(y, ((0, pad), (0, 0))) if pad else y
    out = jnp.zeros((k, k), f64)
    for c in range(n_chunks):
        dep = jax.lax.convert_element_type(out[0, 0] * 0, jnp.int32)
        blk = jax.lax.dynamic_slice(
            y_pad, (jnp.int32(c * step) + dep, dep), (step, k)
        )
        blk = jax.lax.optimization_barrier(blk).astype(f64)
        out = out + blk.T @ blk
    return out


@partial(jax.jit, static_argnames=("spec",))
def _solve_and_polish(y, r, spec=None):
    """y R^{-T} (R from the host f64 Cholesky, cast to y's dtype) then
    two standard CholeskyQR rounds: after the f64-informed first pass
    the basis condition is ~1 + eps*kappa(R), well inside fp32
    CholeskyQR territory."""
    with jax.default_matmul_precision("highest"):
        y = _tri_solve_right(r, y)
        if spec is not None:
            y = jax.lax.with_sharding_constraint(y, spec)
        return _cholqr2_body(y, spec)


def _orthonormalize(y, spec=None, force_host=False):
    """Orthonormal basis of range(y): fp32 CholeskyQR2 below
    _HOST_QR_K columns (verified, retried host-assisted on failure —
    the square-Gaussian basis's condition has a heavy tail so no fixed
    width is always safe), host-f64-Gram-assisted above."""
    k = y.shape[1]
    if not force_host and k <= _HOST_QR_K:
        q = _cholqr2(y, spec)
        err = float(np.asarray(jax.device_get(_ortho_err(q))))
        if math.isfinite(err) and err <= 1e-3:
            return q
    with jax.enable_x64():
        # scope x64 locally: callers (PCA, kernel diagonalization) run
        # f32 pipelines — without this the "f64" Gram silently
        # truncates to f32, which is exactly the failure being fixed
        gram = _gram_f64(y, spec)
        g = np.asarray(jax.device_get(gram), np.float64)
    g = 0.5 * (g + g.T)
    base = float(np.trace(g)) / max(k, 1)
    r = None
    for jit_eps in (0.0, 1e-12, 1e-9, 1e-6):
        try:
            r = np.linalg.cholesky(g + (jit_eps * base) * np.eye(k))
            break
        except np.linalg.LinAlgError:
            continue
    if r is None:
        raise RuntimeError(
            "host f64 Gram Cholesky failed for the spectral-split basis"
        )
    return _solve_and_polish(y, jnp.asarray(r, y.dtype), spec)


@partial(jax.jit, static_argnames=("k", "spec"))
def _project_probes(a_sub, u, seed, k, spec=None):
    """The probe-projection half of _split_apply, split out so the
    big-k path can interleave the host-assisted orthonormalization."""
    m = a_sub.shape[0]
    key1, key2 = jax.random.split(jax.random.PRNGKey(seed))
    with jax.default_matmul_precision("highest"):
        g1 = jax.random.normal(key1, (m, k), dtype=a_sub.dtype)
        g2 = jax.random.normal(key2, (m, m - k), dtype=a_sub.dtype)
        y1 = 0.5 * (g1 - u @ g1)
        y2 = 0.5 * (g2 + u @ g2)
    if spec is not None:
        y1 = jax.lax.with_sharding_constraint(y1, spec)
        y2 = jax.lax.with_sharding_constraint(y2, spec)
    return y1, y2


@partial(jax.jit, static_argnames=("spec",))
def _rayleigh(a_sub, q1, q2, spec=None):
    """The Rayleigh-quotient tail of _split_apply, with the same
    finiteness + trace-leak checks."""
    k = q1.shape[1]
    with jax.default_matmul_precision("highest"):
        aq = a_sub @ jnp.concatenate([q1, q2], axis=1)
        a1 = q1.T @ aq[:, :k]
        a2 = q2.T @ aq[:, k:]
        a1 = 0.5 * (a1 + a1.T)
        a2 = 0.5 * (a2 + a2.T)
    if spec is not None:
        if a1.shape[0] % spec.mesh.shape["i"] == 0:
            a1 = jax.lax.with_sharding_constraint(a1, spec)
        if a2.shape[0] % spec.mesh.shape["i"] == 0:
            a2 = jax.lax.with_sharding_constraint(a2, spec)
    fin = jnp.all(jnp.isfinite(a1)) & jnp.all(jnp.isfinite(a2))
    tr_p = jnp.trace(a_sub)
    tleak = jnp.abs(tr_p - jnp.trace(a1) - jnp.trace(a2)) / (
        1.0 + jnp.abs(tr_p)
    )
    return a1, a2, fin, tleak


def _split_apply_any(a_sub, u, seed, k, spec=None):
    """_split_apply, routed: one fused jit when both basis widths are
    likely fp32-CholeskyQR-safe — VERIFIED via the orthonormality and
    trace-leak checks that ride in the same fetch as the finiteness
    flag — else (or on a failed ortho check) staged with
    host-f64-assisted orthonormalization.

    Returns (q1, q2, a1, a2, ok, tleak): `ok` is the fetched
    finiteness flag, `tleak` the relative trace leak
    |tr(A) - tr(A1) - tr(A2)| / (1 + |tr(A)|) — the caller retries
    the split (fresh probes) or falls back when it is non-negligible,
    because a leak means eigenvalue mass will be silently lost."""
    m = a_sub.shape[0]
    force_host = False
    if max(k, m - k) <= _HOST_QR_K:
        q1, q2, a1, a2, fin, oerr, tleak = _split_apply(
            a_sub, u, seed, k, spec
        )
        fin_h, oerr_h, tleak_h = map(
            float, jax.device_get((fin, oerr, tleak))
        )
        if math.isfinite(oerr_h) and oerr_h <= 1e-3:
            return q1, q2, a1, a2, bool(fin_h), tleak_h
        del q1, q2, a1, a2
        force_host = True  # silent fp32 CholeskyQR corruption: redo
    y1, y2 = _project_probes(a_sub, u, seed, k, spec)
    q1 = _orthonormalize(y1, spec, force_host=force_host)
    del y1
    q2 = _orthonormalize(y2, spec, force_host=force_host)
    del y2
    a1, a2, fin, tleak = _rayleigh(a_sub, q1, q2, spec)
    fin_h, tleak_h = map(float, jax.device_get((fin, tleak)))
    return q1, q2, a1, a2, bool(fin_h), tleak_h


@partial(jax.jit, static_argnames=("k", "spec"))
def _split_apply(a_sub, u, seed, k, spec=None):
    """Projector range finding + CholeskyQR2 + both Rayleigh quotients
    as ONE device program.

    The recursion's eager glue (projectors, probes, bases, products)
    was ~30 separate dispatches per split — each a full round trip
    through a remote-chip tunnel.  Gaussian probes come from on-device
    PRNG (no host upload); the finiteness flag rides along so the host
    fetches once."""
    m = a_sub.shape[0]
    with jax.default_matmul_precision("highest"):
        key1, key2 = jax.random.split(jax.random.PRNGKey(seed))
        g1 = jax.random.normal(key1, (m, k), dtype=a_sub.dtype)
        g2 = jax.random.normal(key2, (m, m - k), dtype=a_sub.dtype)
        # apply the projectors to the probes directly — materializing
        # 0.5 (I +- U) is an extra m^2 buffer for the same flops
        y1 = 0.5 * (g1 - u @ g1)
        y2 = 0.5 * (g2 + u @ g2)
        if spec is not None:
            y1 = jax.lax.with_sharding_constraint(y1, spec)
            y2 = jax.lax.with_sharding_constraint(y2, spec)
        q1 = _cholqr2_body(y1, spec)
        q2 = _cholqr2_body(y2, spec)
        # one m^3 product for both Rayleigh quotients
        aq = a_sub @ jnp.concatenate([q1, q2], axis=1)
        a1 = q1.T @ aq[:, :k]
        a2 = q2.T @ aq[:, k:]
        a1 = 0.5 * (a1 + a1.T)
        a2 = 0.5 * (a2 + a2.T)
        if spec is not None:
            if a1.shape[0] % spec.mesh.shape["i"] == 0:
                a1 = jax.lax.with_sharding_constraint(a1, spec)
            if a2.shape[0] % spec.mesh.shape["i"] == 0:
                a2 = jax.lax.with_sharding_constraint(a2, spec)
        fin = jnp.all(jnp.isfinite(a1)) & jnp.all(jnp.isfinite(a2))
        # two self-checks ride along in the SAME fetch:
        # - orthonormality error: fp32 CholeskyQR2 on a heavy-tailed
        #   square-Gaussian basis can NaN or drift;
        # - TRACE LEAK tr(A) vs tr(A1)+tr(A2): a basis can be
        #   perfectly orthonormal yet range-deficient (amplified
        #   rounding directions outside the projector subspace when
        #   the probe count mismatches the true subspace dimension) —
        #   measured: a k=2450 side of an n=16384 solve leaked 225 of
        #   trace mass while both fin and the ortho check stayed green
        oerr = jnp.maximum(_ortho_err_val(q1), _ortho_err_val(q2))
        tr_p = jnp.trace(a_sub)
        tleak = jnp.abs(tr_p - jnp.trace(a1) - jnp.trace(a2)) / (
            1.0 + jnp.abs(tr_p)
        )
    return q1, q2, a1, a2, fin, oerr, tleak


def _ortho_err_val(q):
    k = q.shape[1]
    g = q.T @ q
    return jnp.linalg.norm(g - jnp.eye(k, dtype=q.dtype)) / math.sqrt(k)


@jax.jit
def _ortho_err(q):
    with jax.default_matmul_precision("highest"):
        return _ortho_err_val(q)


@jax.jit
def _combine(q1, q2, w1, v1, w2, v2):
    """Child results -> parent (w, V) in one dispatch."""
    with jax.default_matmul_precision("highest"):
        w = jnp.concatenate([w1, w2])
        v = jnp.concatenate([q1 @ v1, q2 @ v2], axis=1)
    return w, v


@partial(jax.jit, static_argnames=("ns_iters",))
def _batched_split(a_sub, probes, coeffs_arr, ns_iters):
    """All shift candidates in ONE device program (local solves).

    Through a remote-chip tunnel, every host round trip costs hundreds
    of milliseconds; the old sequential candidate loop paid one RTT per
    shift PLUS a full wasted QDWH when a shift failed.  Here the four
    candidate sigmas are computed on device from the diagonal, the four
    sign matrices run as one vmapped QDWH, and the host fetches ONE
    (trace, involution-error) table to pick the split — U never leaves
    the device.  Local (replicated) solves only: this path is gated to
    subproblems that fit one device."""
    m = a_sub.shape[0]
    d = jnp.diagonal(a_sub)
    sigmas = jnp.stack(
        [
            jnp.median(d),
            0.5 * (jnp.min(d) + jnp.max(d)),
            jnp.quantile(d, 0.25),
            jnp.quantile(d, 0.75),
        ]
    )
    eye = jnp.eye(m, dtype=a_sub.dtype)

    def spd_solve(z, rhs):
        chol = jnp.linalg.cholesky(z)
        y = jax.lax.linalg.triangular_solve(
            chol, rhs, left_side=True, lower=True
        )
        return jax.lax.linalg.triangular_solve(
            chol, y, left_side=True, lower=True, transpose_a=True
        )

    def one(sigma):
        x = a_sub - sigma * eye
        fro = jnp.linalg.norm(x)
        row1 = jnp.max(jnp.sum(jnp.abs(x), axis=1))
        alpha = jnp.minimum(fro, row1) + jnp.asarray(1e-30, x.dtype)
        x = x / alpha

        def step(x, abc):
            a_c, b_c, c_c = abc[0], abc[1], abc[2]
            x2 = x @ x
            y = spd_solve(c_c * x2 + eye, x)
            x = (b_c / c_c) * x + (a_c - b_c / c_c) * y
            return 0.5 * (x + x.T), None

        x, _ = jax.lax.scan(step, x, coeffs_arr)

        def polish(_, x):
            x = 0.5 * x @ (3.0 * eye - x @ x)
            return 0.5 * (x + x.T)

        x = jax.lax.fori_loop(0, ns_iters, polish, x)
        tr = jnp.trace(x)
        err = jnp.linalg.norm(x @ (x @ probes) - probes) / jnp.linalg.norm(
            probes
        )
        return x, tr, err

    with jax.default_matmul_precision("highest"):
        return jax.vmap(one)(sigmas)


def _base_eigh(a_sub):
    """Base-case leaf eigh of the D&C recursion (eager call site).

    Routed through linalg.eigen.eigh_full: accelerator eigh programs at
    leaf sizes (512-2048) serialize to hundreds of MB EACH, and uneven
    spectral splits give every leaf a distinct shape — a fresh giant
    compile (or a giant cache-entry load through a remote runtime) per
    leaf.  Host LAPACK at these sizes is faster end-to-end; the knob
    DISSECT_TPU_HOST_EIGH_MAX restores the device leaves on hardware
    where executable loads are local.

    Beyond-cap fallbacks (a failed split at m > 8192) go to host
    LAPACK too on accelerators: XLA's unrolled device eigh at m=10240+
    is compile-REJECTED for HBM (33.5 GB at 16384), so 'slow but
    correct minutes on the host' is the only refuge that exists."""
    from dissect_tpu.linalg.eigen import eigh_full

    n = a_sub.shape[0]
    if n > 8192 and jax.default_backend() != "cpu":
        w, v = np.linalg.eigh(
            np.asarray(jax.device_get(a_sub), dtype=np.float64)
        )
        return jnp.asarray(w, a_sub.dtype), jnp.asarray(v, a_sub.dtype)
    return eigh_full(a_sub)


def distributed_eigh(
    a,
    mesh: Optional[Mesh] = None,
    axis: str = "i",
    block: Optional[int] = None,
    base_size: int = 2048,
    l0: float = 1e-6,
    seed: int = 0,
    max_depth: int = 32,
    allow_local_fallback: bool = False,
    batch_threshold: int = 8192,
):
    """Full eigendecomposition (w ascending, V) via spectral D&C.

    All O(N^3) work is sharded when `mesh` is given — the sign
    iterations, the projector range finding + CholeskyQR2, and the
    Rayleigh quotients all carry row-sharding constraints; subproblems
    of size <= base_size use local jnp eigh.  A failed spectral split
    above base_size raises (at beyond-HBM N a silent local eigh would
    OOM, and the reference aborts on pdsyev failure,
    matrix.cpp:3327-3380) unless `allow_local_fallback` opts back in.
    """
    a = jnp.asarray(a)
    rng = np.random.default_rng(seed)
    n = a.shape[0]
    spec = NamedSharding(mesh, P(axis, None)) if mesh is not None else None
    n_dev = mesh.shape[axis] if mesh is not None else 1

    def constrain(x):
        """Row-shard eagerly when the row count divides the mesh
        (eager resharding rejects uneven dims; jitted interiors still
        shard unevenly fine)."""
        if spec is not None and x.shape[0] % n_dev == 0:
            return jax.lax.with_sharding_constraint(x, spec)
        return x

    def local_or_raise(a_sub, depth, reason):
        m = a_sub.shape[0]
        if mesh is None or allow_local_fallback:
            return _base_eigh(a_sub)
        raise RuntimeError(
            f"distributed_eigh: no valid spectral split for a {m} x {m} "
            f"subproblem at depth {depth} ({reason}); a local eigh at "
            "this size could exhaust one device's memory.  Retry with a "
            "larger base_size, float64, or allow_local_fallback=True."
        )

    def rec(a_sub, depth):
        m = a_sub.shape[0]
        if m <= base_size:
            return _base_eigh(a_sub)
        if depth >= max_depth:
            return local_or_raise(a_sub, depth, "max recursion depth")
        a_sub = constrain(a_sub)
        # Candidate split points.  The median of the diagonal is the
        # QDWH-eig default; clustered spectra (e.g. a low-rank GRM plus
        # a ridge puts many eigenvalues at exactly the ridge value) can
        # land sigma ON an eigenvalue, where sign(A - sigma I) is not an
        # involution and the projector ranks are wrong — in float32 that
        # cascades into NaNs.  So: try several shifts, accept the first
        # whose sign matrix is a numerical involution with an interior
        # rank split, and otherwise fall back to a local solve.
        # involution probe: || U (U v) - v || over a few random vectors
        # is O(m^2) per candidate where the exact || U^2 - I ||_F check
        # costs a whole extra m^3 matmul; the sign map's failure mode
        # (sigma on an eigenvalue) inflates the residual by orders of
        # magnitude, so a probe discriminates just as reliably
        eps = float(jnp.finfo(a_sub.dtype).eps)
        inv_tol = 100.0 * math.sqrt(eps)
        probes = jnp.asarray(
            rng.standard_normal((m, 4)) / math.sqrt(m), a_sub.dtype
        )
        coeffs = jnp.asarray(
            np.asarray(qdwh_coefficients(l0), dtype=np.float64),
            dtype=a_sub.dtype,
        )
        split = None
        batched_ok = m <= batch_threshold and _batched_fits(a_sub, m)
        if batched_ok:
            # one device program for ALL candidates, one host fetch
            try:
                us, trs, errs = _batched_split(a_sub, probes, coeffs, 2)
            except jax.errors.JaxRuntimeError:
                # compile-time HBM rejection (the batched program's
                # footprint is shape/padding dependent): fall through
                # to the sequential sharded branch
                batched_ok = False
        if batched_ok:
            trs_h, errs_h = (
                np.asarray(v, np.float64)
                for v in jax.device_get((trs, errs))
            )
            for i in range(len(trs_h)):
                tr, inv_err = float(trs_h[i]), float(errs_h[i])
                if not math.isfinite(tr):
                    continue
                k = int(round((m - tr) / 2.0))
                if k <= 0 or k >= m:
                    continue
                if not math.isfinite(inv_err) or inv_err > inv_tol:
                    continue
                split = (us[i], k)
                break
            # the stacked (4, m, m) candidate buffer would otherwise
            # stay pinned through the whole subtree below
            del us
        else:
            # beyond one device's memory: sharded sign iterations, one
            # candidate at a time (one RTT each; the m^3 work dwarfs it)
            dvals = np.asarray(jax.device_get(jnp.diagonal(a_sub)), np.float64)
            candidates = []
            for s in (
                float(np.median(dvals)),
                0.5 * (float(dvals.min()) + float(dvals.max())),
                float(np.quantile(dvals, 0.25)),
                float(np.quantile(dvals, 0.75)),
            ):
                if all(
                    abs(s - c) > 1e-12 * max(1.0, abs(s)) for c in candidates
                ):
                    candidates.append(s)
            for sigma in candidates:
                # the diagonal shift runs jitted so the identity fuses
                # into the subtraction — an eager jnp.eye(m) is a full
                # extra plane of HBM at every recursion level
                u = matrix_sign(
                    _shift_diag(a_sub, jnp.asarray(sigma, a_sub.dtype)),
                    mesh, axis, block, l0,
                )
                tr_dev = jnp.trace(u)
                err_dev = jnp.linalg.norm(
                    u @ (u @ probes) - probes
                ) / jnp.linalg.norm(probes)
                tr, inv_err = map(float, jax.device_get((tr_dev, err_dev)))
                if not math.isfinite(tr):
                    continue
                k = int(round((m - tr) / 2.0))
                if k <= 0 or k >= m:
                    continue
                if not math.isfinite(inv_err) or inv_err > inv_tol:
                    continue
                split = (u, k)
                break
        if split is None:
            return local_or_raise(a_sub, depth, "all shift candidates failed")
        u, k = split
        # projector range finding + CholeskyQR2 + Rayleigh quotients in
        # ONE jitted dispatch per split (remote-tunnel friendly); stays
        # row-sharded when the row count divides the mesh
        basis_spec = spec if m % n_dev == 0 else None
        # trace-leak guard: a split whose children's traces do not sum
        # to the parent's is silently LOSING eigenvalue mass (wrong
        # probe count vs the true subspace dimension, or an unlucky
        # basis draw).  Retry once with fresh probes; a persistent
        # leak means k itself is off — fall back to a local solve.
        ok = False
        tleak = math.inf
        for attempt in range(2):
            q1, q2, a1, a2, ok, tleak = _split_apply_any(
                a_sub, u, int(rng.integers(1 << 31)), k, basis_spec
            )
            if os.environ.get("DISSECT_TPU_DC_DEBUG"):
                print(f"    dc-split m={m} k={k} attempt={attempt} "
                      f"ok={ok} tleak={tleak:.2e}", flush=True)
            if ok and tleak <= 1e-3:
                break
        if not ok:
            return local_or_raise(a_sub, depth, "non-finite Rayleigh quotient")
        if tleak > 1e-3:
            return local_or_raise(
                a_sub, depth,
                f"trace leak {tleak:.2e} after basis retry (split rank "
                "mismatch)",
            )
        # free the parent operand, sign matrix and probes BEFORE
        # recursing: python frame locals otherwise pin two full planes
        # per recursion level for the whole subtree (the n=16384 v5e
        # run OOMed exactly here)
        del a_sub, u, split, probes, coeffs
        w1, v1 = rec(a1, depth + 1)
        del a1
        w2, v2 = rec(a2, depth + 1)
        del a2
        return _combine(q1, q2, w1, v1, w2, v2)

    with jax.default_matmul_precision("highest"):
        # eager glue in rec needs true-fp32 matmuls on TPU as much as
        # the jitted interiors do
        w, v = rec(a, 0)
        order = jnp.argsort(w)
        return w[order], v[:, order]
