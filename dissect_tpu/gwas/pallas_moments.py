"""Pallas TPU kernel: fused per-SNP weighted moments for ML refits.

One Fisher-scoring iteration of the mixed-model GWAS / IGWAS per-SNP
ML refit (gwas/mlm.py `_ml_refit_core`; reference embedded REML,
gwas.cpp:787-914) needs, for every SNP row m with per-SNP weights
w1 = 1/(t1*lam + t2), w2 = w1^2, w3 = w2*lam:

    m1 = w1 @ feats          m2 = w2 @ feats          (shared-column moments)
    gs_k = (wk * g) @ s      gg_k = sum_n wk * g^2    (genotype moments)

In XLA each weighted copy wk*g and the weights themselves materialize
in HBM (dot operands cannot fuse), so one iteration moves ~16x the
size of G.  This kernel computes everything in one pass over G: the
weights and weighted tiles live only in VMEM, G is read once per
iteration — the HBM floor.  All nine results pack into one (M, 128)
row block (static column layout below).

Requires 2*K + 3*q + 3 <= 128 (q = covariates+1, K = feature columns);
the caller falls back to the XLA formulation beyond that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def moment_columns(q: int, k_feats: int):
    """Static column layout of the packed (M, 128) output:
    [m1 | m2 | gs1 | gs2 | gs3 | gg1 gg2 gg3 | zero pad]."""
    c0_m1 = 0
    c0_m2 = k_feats
    c0_gs1 = 2 * k_feats
    c0_gs2 = c0_gs1 + q
    c0_gs3 = c0_gs2 + q
    c0_gg = c0_gs3 + q
    total = c0_gg + 3
    return c0_m1, c0_m2, c0_gs1, c0_gs2, c0_gs3, c0_gg, total


def _moments_kernel(th_ref, lam_ref, g_ref, s_ref, feats_ref, out_ref):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    th = th_ref[:]
    lam = lam_ref[0, :][None, :]  # (1, bk)
    v = th[:, 0:1] * lam + th[:, 1:2]
    w1 = 1.0 / v
    w2 = w1 * w1
    g = g_ref[:]
    g1 = w1 * g
    g2 = w2 * g
    g3 = g2 * lam
    f32 = jnp.float32
    m1 = jnp.dot(w1, feats_ref[:], preferred_element_type=f32)
    m2 = jnp.dot(w2, feats_ref[:], preferred_element_type=f32)
    s = s_ref[:]
    gs1 = jnp.dot(g1, s, preferred_element_type=f32)
    gs2 = jnp.dot(g2, s, preferred_element_type=f32)
    gs3 = jnp.dot(g3, s, preferred_element_type=f32)
    gg1 = jnp.sum(g1 * g, axis=1, keepdims=True)
    gg2 = jnp.sum(g2 * g, axis=1, keepdims=True)
    gg3 = jnp.sum(g3 * g, axis=1, keepdims=True)
    acc = jnp.concatenate([m1, m2, gs1, gs2, gs3, gg1, gg2, gg3], axis=1)
    pad = out_ref.shape[1] - acc.shape[1]
    if pad:
        acc = jnp.pad(acc, ((0, 0), (0, pad)))
    out_ref[:] += acc


@partial(jax.jit, static_argnames=("block_m", "block_k", "interpret"))
def fused_refit_moments(
    g, thetas, lam, s, feats,
    block_m: int = 256, block_k: int = 1024, interpret: bool = False,
):
    """All nine ML-refit moments in one pass over g.

    g: (M, n) fp32 (eigenbasis genotypes; n-padded entries must be
    zero); thetas: (M, 2) current per-SNP variances; lam: (n,)
    eigenvalues; s: (n, q) shared columns; feats: (n, K) shared
    feature columns.  Returns (M, 128) packed per `moment_columns`.

    Zero-pad rows contribute nothing: padded n entries have
    g = s = feats = 0 so every product vanishes; padded M rows (theta
    padded with ones by the caller) produce garbage only in their own
    discarded rows.
    """
    m, n = g.shape
    q = s.shape[1]
    k_feats = feats.shape[1]
    total = moment_columns(q, k_feats)[-1]
    if total > LANES:
        raise ValueError(
            f"moment columns {total} exceed one lane group ({LANES}); "
            "use the XLA fallback"
        )
    m_pad = (-m) % block_m
    k_pad = (-n) % block_k
    if m_pad:
        g = jnp.pad(g, ((0, m_pad), (0, 0)))
        thetas = jnp.pad(thetas, ((0, m_pad), (0, 0)), constant_values=1.0)
    if k_pad:
        g = jnp.pad(g, ((0, 0), (0, k_pad)))
        lam = jnp.pad(lam, (0, k_pad))
        s = jnp.pad(s, ((0, k_pad), (0, 0)))
        feats = jnp.pad(feats, ((0, k_pad), (0, 0)))
    mp, np_ = g.shape
    grid = (mp // block_m, np_ // block_k)
    out = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, 2), lambda mi, kb: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda mi, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda mi, kb: (mi, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, q), lambda mi, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, k_feats), lambda mi, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, LANES), lambda mi, kb: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(14 * mp * np_),
            bytes_accessed=int(g.size * 4 + mp * LANES * 4),
            transcendentals=0,
        ),
    )(thetas, lam[None, :], g, s, feats)
    return out[:m]
