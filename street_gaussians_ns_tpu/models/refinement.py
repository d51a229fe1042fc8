"""Adaptive density control (densify / split / dup / cull) on the
fixed-capacity store — jit-safe masked scatters instead of the reference's
tensor reallocation + Adam surgery (sgn_splatfacto.py:513-720).

Exact schedule & thresholds replicated:
  * stats: per-step accumulation of ||dL/dxys|| over visible gaussians and
    max screen radius ratio (after_train, :513-541), stopped at stop_split_at;
  * every refine_every steps past warmup (refinement_after, :550-646):
      - densify iff step < stop_split_at AND
        step % (reset_alpha_every*refine_every) > num_train_data + refine_every
      - high_grads: (sum_grad/vis_count) * 0.5 * max(H,W) > densify_grad_thresh
      - split if scale_max > densify_size_thresh (or screen size >
        split_screen_size until stop_screen_size_at), n_split_samples
        children at means + R(q) (exp(scale) * N(0,1)), child scales /1.6,
        original culled; dup otherwise (1 copy);
      - cull: alpha < cull_alpha_thresh, plus (past the first reset
        interval) scale_max > cull_scale_thresh, plus (until
        stop_screen_size_at) screen size > cull_screen_size; children are
        subject to the same cull in the same round (the reference culls the
        *concatenated* buffer) — scatter first, cull second;
      - opacity reset when step % reset_interval == refine_every: clamp
        logit-opacity to logit(2*cull_alpha_thresh) and zero the opacities
        Adam moments (:630-646).

New/culled slots get zeroed Adam moments via engine.optimizers.mask_moments.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import quaternions as quat
from ..engine.optimizers import AdamState, mask_moments
from .gaussians import GaussianParams, GaussianStore, zeros_stats
from .splatfacto import SplatfactoConfig


def update_stats(
    store: GaussianStore,
    xys_grad: jax.Array,   # (CAP, 2) dL/dxys for this step
    radii: jax.Array,      # (CAP,) int32
    max_hw: int,
    step: jax.Array,
    config: SplatfactoConfig,
) -> GaussianStore:
    """Accumulate densification statistics (after_train, :513-541)."""
    visible = (radii > 0) & store.active
    grads = jnp.linalg.norm(xys_grad, axis=-1)
    run = (step < config.stop_split_at)

    def acc(cur, new):
        return jnp.where(run, new, cur)

    xys_grad_norm = acc(store.xys_grad_norm,
                        store.xys_grad_norm + jnp.where(visible, grads, 0.0))
    vis_counts = acc(store.vis_counts,
                     store.vis_counts + visible.astype(jnp.float32))
    max_2dsize = acc(store.max_2dsize,
                     jnp.where(visible,
                               jnp.maximum(store.max_2dsize,
                                           radii.astype(jnp.float32) / max_hw),
                               store.max_2dsize))
    return dataclasses.replace(store, xys_grad_norm=xys_grad_norm,
                               vis_counts=vis_counts, max_2dsize=max_2dsize)


def _scatter_children(
    params: GaussianParams,
    active: jax.Array,
    child_params: GaussianParams,   # (M, ...) candidate children
    child_valid: jax.Array,         # (M,) bool
) -> Tuple[GaussianParams, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Place valid children into inactive slots (first-fit). Returns
    (params, active, placed_mask_over_slots, placed_mask_over_children,
    n_dropped)."""
    cap = active.shape[0]
    free = ~active
    # Rank of each free slot among free slots; rank of each valid child.
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1          # (CAP,)
    child_rank = jnp.cumsum(child_valid.astype(jnp.int32)) - 1  # (M,)
    n_free = jnp.sum(free.astype(jnp.int32))
    n_children = jnp.sum(child_valid.astype(jnp.int32))
    placed = child_valid & (child_rank < n_free)

    # rank_to_slot[r] = index of the r-th free slot (cap+1 entries; index
    # cap is the write-sink for non-free slots).
    rank_to_slot = jnp.full((cap + 1,), cap, jnp.int32)
    rank_to_slot = rank_to_slot.at[jnp.where(free, free_rank, cap)].set(
        jnp.arange(cap, dtype=jnp.int32))
    # Unplaced children target index cap -> dropped by mode="drop".
    target = jnp.where(placed, rank_to_slot[jnp.clip(child_rank, 0, cap)], cap)

    def scat(buf, child):
        return buf.at[target].set(child, mode="drop")

    new_params = GaussianParams(**{
        k: scat(getattr(params, k), getattr(child_params, k))
        for k in params.as_dict()
    })
    new_active = active.at[target].set(True, mode="drop")
    placed_slots = jnp.zeros((cap,), bool).at[target].set(placed, mode="drop")
    n_dropped = n_children - jnp.sum(placed.astype(jnp.int32))
    return new_params, new_active, placed_slots, placed, n_dropped


def refine(
    store: GaussianStore,
    step: jax.Array,
    config: SplatfactoConfig,
    num_train_data: int,
    max_hw: jax.Array,
    rng: jax.Array,
):
    """One refinement pass. Pure; call every refine_every steps past warmup.

    Returns (new_store, surgery, info) where surgery = {"keep": (CAP,) bool
    mask of slots whose Adam moments survive (culled + freshly scattered
    slots are zeroed by the caller via engine.optimizers.mask_moments),
    "reset_opacities": () bool — zero the opacities group's moments}.
    Separating the moment surgery keeps this function vmappable over a
    stacked object axis (AdamState.count is shared, not per-object).
    """
    p = store.params
    cap = store.capacity
    reset_interval = config.reset_alpha_every * config.refine_every

    run = step > config.warmup_length
    do_densify = run & (step < config.stop_split_at) & (
        (step % reset_interval) > (num_train_data + config.refine_every))

    vis = jnp.maximum(store.vis_counts, 1.0)
    avg_grad = (store.xys_grad_norm / vis) * 0.5 * max_hw
    high_grads = store.active & (avg_grad > config.densify_grad_thresh)

    scale_max = jnp.exp(p.scales).max(axis=-1)
    big_world = scale_max > config.densify_size_thresh
    big_screen = (step < config.stop_screen_size_at) & (
        store.max_2dsize > config.split_screen_size)
    splits = do_densify & high_grads & (big_world | big_screen)
    dups = do_densify & high_grads & (~big_world)

    # --- children --------------------------------------------------------
    # XLA:TPU scatter runs element-serial (~7 ns/element), so candidate
    # children must be COMPACTED before the placement scatter: generating
    # (nsamps+1)*CAP candidates and scattering them cost ~650 ms at 1M
    # capacity even though almost all were invalid. Parents that split or
    # dup this round (typically a few %% of CAP) are compacted to a static
    # CAP/16 budget first (one small stable sort + row gathers), children
    # are generated only for them, and the scatter input shrinks ~16x.
    # Parents past the budget are counted in children_dropped — the same
    # fixed-capacity drop semantics the slot budget already had.
    nsamps = config.n_split_samples
    capp = min(cap, max(256, cap // config.refine_parent_cap_div))
    parent_has = splits | dups
    order = jax.lax.sort(
        ((~parent_has).astype(jnp.int32), jnp.arange(cap, dtype=jnp.int32)),
        num_keys=1, is_stable=True)[1]
    sel = order[:capp]                                 # (CAPP,) parents
    psel = jax.tree.map(lambda x: x[sel], p)
    splits_sel = splits[sel]
    dups_sel = dups[sel]

    k_noise, = jax.random.split(rng, 1)
    noise = jax.random.normal(k_noise, (nsamps, capp, 3), jnp.float32)
    R = quat.to_rotmat(quat.normalize(psel.quats))              # (CAPP,3,3)
    samples = jnp.einsum("nij,snj->sni", R, noise * jnp.exp(psel.scales))
    split_means = psel.means[None] + samples                    # (S,CAPP,3)
    split_scales = jnp.broadcast_to(
        jnp.log(jnp.exp(psel.scales) / 1.6), (nsamps, capp, 3))

    # PARENT-MAJOR child order ((CAPP, S) flattened): one parent's
    # samples occupy adjacent child slots, so the first-fit placement
    # under a tight slot budget completes WHOLE split families — the
    # cull below only kills parents whose full replacement landed.
    def pm(x_snc):
        return jnp.swapaxes(x_snc, 0, 1).reshape(
            (capp * nsamps,) + x_snc.shape[2:])

    def rep(x):
        return jnp.repeat(x, nsamps, axis=0)

    split_children = GaussianParams(
        means=pm(split_means),
        scales=pm(split_scales),
        quats=rep(psel.quats),
        features_dc=rep(psel.features_dc),
        features_rest=rep(psel.features_rest),
        opacities=rep(psel.opacities),
    )
    dup_children = psel

    children = GaussianParams(**{
        k: jnp.concatenate([getattr(split_children, k), getattr(dup_children, k)])
        for k in p.as_dict()
    })
    child_valid = jnp.concatenate([
        jnp.repeat(splits_sel, nsamps), dups_sel])

    new_params, new_active, placed, placed_children, n_dropped = \
        _scatter_children(p, store.active, children, child_valid)
    # Children lost to the parent budget (not just the slot budget).
    over_splits = jnp.sum(splits.astype(jnp.int32)) - jnp.sum(
        splits_sel.astype(jnp.int32))
    over_dups = jnp.sum(dups.astype(jnp.int32)) - jnp.sum(
        dups_sel.astype(jnp.int32))
    n_dropped = n_dropped + over_splits * nsamps + over_dups

    # --- cull over the full (post-scatter) buffer -------------------------
    alpha = jax.nn.sigmoid(new_params.opacities[:, 0])
    culls = new_active & (alpha < config.cull_alpha_thresh)
    sm = jnp.exp(new_params.scales).max(axis=-1)
    past_first_reset = step > reset_interval
    toobig_world = sm > config.cull_scale_thresh
    # max_2dsize is zero for children (stats array untouched by scatter).
    max2d = jnp.where(placed, 0.0, store.max_2dsize)
    toobig_screen = (step < config.stop_screen_size_at) & (
        max2d > config.cull_screen_size)
    culls = culls | (past_first_reset & new_active & (toobig_world | toobig_screen))
    # split originals die (splits_mask, :613-625) — but ONLY parents whose
    # children were actually PLACED: parents past the CAPP compaction
    # budget never produced children, and parents whose generated
    # children were all dropped by the SLOT budget (buffer near capacity)
    # got no replacement either — culling those would make gaussians
    # vanish without replacement. Require ALL nsamps split samples
    # placed (a partially-placed parent is kept: slight transient
    # over-densification, corrected by later culls, beats losing the
    # splat's mass outright). Scatter the mask back over `sel` (distinct
    # indices by construction) into a (CAP,) mask.
    split_children_placed = jnp.all(
        placed_children[:nsamps * capp].reshape(capp, nsamps), axis=1)
    splits_replaced = jnp.zeros((cap,), jnp.bool_).at[sel].set(
        splits_sel & split_children_placed, unique_indices=True)
    culls = culls | splits_replaced
    # Reference quirk replicated: past stop_split_at, after_train stops
    # refreshing stats so refinement_after early-returns on every call
    # EXCEPT the first refine boundary at/after stop_split_at (whose stats
    # were accumulated just before the cutoff) — i.e. post-densification
    # culling fires exactly once (sgn_splatfacto.py:515-517, 556-558, 628).
    final_cull = (config.continue_cull_post_densification
                  & (step >= config.stop_split_at)
                  & (step < config.stop_split_at + config.refine_every))
    do_cull = run & (do_densify | final_cull)
    culls = jnp.where(do_cull, culls, False)

    new_active = new_active & (~culls)

    # --- Adam moment surgery mask ------------------------------------------
    keep = (~culls) & (~placed)  # children start with zero moments too

    # --- opacity reset ------------------------------------------------------
    do_reset = run & (step < config.stop_split_at) & (
        (step % reset_interval) == config.refine_every)
    reset_logit = jnp.log(jnp.float32(2.0 * config.cull_alpha_thresh)
                          / (1.0 - 2.0 * config.cull_alpha_thresh))
    new_opac = jnp.where(do_reset,
                         jnp.minimum(new_params.opacities, reset_logit),
                         new_params.opacities)
    new_params = dataclasses.replace(new_params, opacities=new_opac)

    # Stats reset only once refinement actually runs (within warmup the
    # reference early-returns and keeps accumulating, :552-555).
    g, v, m = zeros_stats(cap)
    new_store = GaussianStore(
        params=new_params, active=new_active,
        xys_grad_norm=jnp.where(run, g, store.xys_grad_norm),
        vis_counts=jnp.where(run, v, store.vis_counts),
        max_2dsize=jnp.where(run, m, store.max_2dsize),
    )
    info = {
        "high_grads_count": jnp.sum(high_grads.astype(jnp.int32)),
        "refine_splits_count": jnp.sum(splits.astype(jnp.int32)),
        "refine_dups_count": jnp.sum(dups.astype(jnp.int32)),
        "refine_culls_count": jnp.sum(culls.astype(jnp.int32)),
        "children_dropped": n_dropped,
        "gaussian_count": jnp.sum(new_active.astype(jnp.int32)),
    }
    surgery = {"keep": keep, "reset_opacities": do_reset}
    return new_store, surgery, info


def apply_moment_surgery(opt_states: dict, surgery: dict) -> dict:
    """Zero Adam moments for culled/new slots and (on opacity reset) the
    whole opacities group. opt_states: group name -> AdamState whose leaves
    lead with the surgery mask's axes."""
    keep = surgery["keep"]
    do_reset = surgery["reset_opacities"]
    new = {name: mask_moments(s, keep) for name, s in opt_states.items()}
    op = new["opacities"]
    reset = jnp.asarray(do_reset)

    def zero(x):
        r = reset.reshape(reset.shape + (1,) * (x.ndim - reset.ndim))
        return jnp.where(r, 0.0, x)

    new["opacities"] = AdamState(mu=jax.tree.map(zero, op.mu),
                                 nu=jax.tree.map(zero, op.nu), count=op.count)
    return new
