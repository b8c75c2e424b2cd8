"""Sharded batch-lnprob construction via ``jax.shard_map``.

The likelihood factorizes as

    lnprob(theta) = lnprior(theta)
                  + [ per-source reduction  (sharded over 'sources', psum) ]
                  - [ per-field grid integral (replicated; small) ]

and walkers are embarrassingly parallel, so the batched evaluator maps a
(W, D) theta block onto the mesh with the walker axis split over
``walkers`` and every per-source context array split over ``sources``.
The only collective in the hot loop is one ``psum`` over the source axis
per evaluation — everything else is local. This is the TPU counterpart of
the reference's serial ``lnprob`` calls (``lumfuncmcmc.py:489-491``).

When the source axis is sharded the direct per-source reduction is used
(``collapse=False``): the collapsed O(1) ln-term already makes the source
dimension free, so sharding it is only needed for the theta-dependent
Omega paths (free completeness, z evolution) and mega-catalogs.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.models.likelihood import (
    lnprior, lnlike_single_epoch_parts, NEG_INF)
from lumfuncmcmc_tpu.models.likelihood_z import lnprior_z, lnlike_z_parts
from lumfuncmcmc_tpu.parallel.mesh import AXIS_SOURCES, AXIS_WALKERS

# context fields carrying a leading source axis
_SRC_FIELDS = ("lum", "zsrc", "logf_src", "omega0_src", "ln_om_src",
               "field_id", "src_mask")


def pad_sources(ctx: LFContext, multiple: int) -> LFContext:
    """Pad the source axis to a multiple of the mesh source axis.

    Padded rows carry ``src_mask = 0`` and replicate a real row's values,
    so the masked likelihood is unchanged (no -inf/NaN from fabricated
    inputs)."""
    n = ctx.lum.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return ctx
    pad = target - n
    updates = {}
    for f in _SRC_FIELDS:
        arr = getattr(ctx, f)
        fill = (jnp.zeros_like(arr[0:1]) if f == "src_mask" else arr[0:1])
        updates[f] = jnp.concatenate([arr, jnp.repeat(fill, pad, axis=0)])
    return dataclasses.replace(ctx, **updates)


def _chain_blk(nchains: int, shards: int, what: str) -> int:
    """Chains per device block, validating divisibility with the run
    paths' explicit error. The continuation wrappers used to floor-
    divide silently, so an elastic resume onto a mesh whose device
    count does not divide the chain count died inside ``shard_map``
    with an opaque axis-size error instead of this message."""
    if nchains % shards:
        raise ValueError(
            f"chain count {nchains} must be a multiple of the mesh "
            f"{what} {shards} (whole chain blocks per device)")
    return nchains // shards


def _pad_walkers(thetas, multiple: int):
    """Pad a (W, D) walker batch to a multiple of the sharded walker
    axis by repeating row 0 (an always-in-bounds real theta, so padded
    lanes never produce NaN work). Returns ``(padded, W)`` — callers
    slice outputs back to ``[:W]``."""
    w = thetas.shape[0]
    wpad = -(-w // multiple) * multiple
    if wpad != w:
        thetas = jnp.concatenate(
            [thetas,
             jnp.broadcast_to(thetas[:1],
                              (wpad - w,) + thetas.shape[1:])])
    return thetas, w


def _ctx_specs(ctx: LFContext, shard_sources: bool):
    """PartitionSpec pytree matching the context structure."""
    kw = {name: (P(AXIS_SOURCES) if shard_sources and name in _SRC_FIELDS
                 else P())
          for name in type(ctx).__dataclass_fields__}
    kw["cosmo"] = jax.tree_util.tree_map(lambda _: P(), ctx.cosmo)
    return LFContext(**kw)


def make_lnprob_sharded(ctx: LFContext, layout, mesh, model="single",
                        collapse=True, exact_bounds=False,
                        min_comp_frac=0.5, lh=46.0):
    """Build a (W, D) -> (W,) batched lnprob running on ``mesh``.

    ``model``: "single" (ThetaLayout), "z" (ThetaLayoutZ) or "hier".
    ``exact_bounds`` selects the theta-exact integration-bound likelihood
    for the free-completeness single-epoch model. Any walker batch size
    is accepted — padded up to a walker-axis multiple and sliced back.
    """
    nw_shards = mesh.shape[AXIS_WALKERS]
    ns_shards = mesh.shape[AXIS_SOURCES]
    shard_sources = ns_shards > 1
    if model == "hier":
        # the hierarchical likelihood reads only replicated per-field
        # catalog scalars — there is no per-source term to shard, and
        # psum'ing its "source part" would double-count the data term
        # once per shard. Replicate instead.
        shard_sources = False
    if shard_sources:
        collapse = False  # collapsed scalars are whole-catalog quantities
        ctx = pad_sources(ctx, ns_shards)
    cspecs = _ctx_specs(ctx, shard_sources)

    if model == "single":
        if exact_bounds:
            from lumfuncmcmc_tpu.models.likelihood import (
                lnlike_exact_bounds_parts)
            lum_floor = float(jnp.min(ctx.lum))

            def scalar_parts(theta, c):
                return lnlike_exact_bounds_parts(theta, c, layout,
                                                 min_comp_frac, lum_floor,
                                                 lh)
        else:
            def scalar_parts(theta, c):
                return lnlike_single_epoch_parts(theta, c, layout,
                                                 collapse=collapse)
        scalar_lnprior = partial(lnprior, layout=layout)
    elif model == "z":
        def scalar_parts(theta, c):
            return lnlike_z_parts(theta, c, layout)
        scalar_lnprior = partial(lnprior_z, layout=layout)
    elif model == "hier":
        from lumfuncmcmc_tpu.models.hierarchical import (
            lnlike_h, lnprior_h)

        def scalar_parts(theta, c):
            return lnlike_h(theta, c, layout), jnp.zeros((), theta.dtype)
        scalar_lnprior = partial(lnprior_h, layout=layout)
    else:
        raise ValueError(f"unknown model {model!r}")

    def local_batch(thetas_blk, ctx_blk):
        """Evaluate the local walker block against the local source shard."""
        def one(theta):
            # lnpart reduces over the (possibly local) source axis;
            # fullint is a pure function of replicated grid arrays, so
            # each device computes the identical value — sum the source
            # parts across shards and subtract the integral exactly once
            # (a single grid reduction per theta, not two).
            lnpart, fullint = scalar_parts(theta, ctx_blk)
            if shard_sources:
                lnpart = jax.lax.psum(lnpart, AXIS_SOURCES)
            lnl = lnpart - fullint
            lp = scalar_lnprior(theta)
            return jnp.where(jnp.isfinite(lp), lp + lnl, NEG_INF)
        return jax.vmap(one)(thetas_blk)

    sharded_fn = jax.shard_map(
        local_batch, mesh=mesh,
        in_specs=(P(AXIS_WALKERS), cspecs),
        out_specs=P(AXIS_WALKERS))

    def batch(thetas):
        thetas, w = _pad_walkers(thetas, nw_shards)
        return sharded_fn(thetas, ctx)[:w]

    return batch


def run_nuts_sharded(lnp_y, y0, key, mesh, num_warmup, num_samples,
                     pooled=False, **kw):
    """Per-device NUTS replicas: chains split over ALL mesh devices,
    each device running the full ``run_nuts`` (warmup, dual-averaging,
    mass adaptation) on its local chain block with the NATIVE
    per-device gradient callable — a composition jit auto-partitioning
    cannot express (XLA cannot partition a ``pallas_call``).

    ``pooled=False`` (default): step-size/mass adaptation pools only
    the LOCAL chains, so each device is an independent NUTS replica
    with its own adapted eps (numpyro's parallel ``chain_method`` has
    the same semantics). ``pooled=True``: the acceptance statistic and
    diag-mass moments are ``pmean``-pooled across the mesh each warmup
    step, so all devices adapt ONE shared eps/mass from the global
    chain population — the sharded twin of the meshless pooled
    adaptation (the returned per-device eps entries are then all
    equal). Returns ``(samples (S, C, D), lnps (S, C), alphas (S, C),
    eps (ndev,), div_frac (ndev,))``.

    ``return_state=True`` appends the frozen-adaptation state
    ``(y_run (C, D), eps (C,), scale (C, D))`` — PER CHAIN, each chain
    carrying the step size/mass its own device's warmup adapted, so the
    state regroups freely onto a different mesh shape (elastic
    checkpoints). Feed it to :func:`continue_nuts_sharded` to extend
    every replica without re-warmup (the sharded twin of
    ``continue_nuts``).

    RNG layout: warmup keys fold by the device index (devices must
    warm up on distinct transition streams), but the recorded sampling
    phase uses PER-GLOBAL-CHAIN streams
    (``run_nuts(sampling_key=key, chain_ids=<block's global ids>)``),
    so the sampled chains are a function of (key, chain index) only —
    independent of the mesh factorization.
    """
    from lumfuncmcmc_tpu.samplers.nuts import run_nuts

    return_state = bool(kw.pop("return_state", False))
    C = y0.shape[0]
    ns = mesh.shape[AXIS_SOURCES]
    blk = _chain_blk(C, mesh.shape[AXIS_WALKERS] * ns, "device count")
    axes = (AXIS_WALKERS, AXIS_SOURCES)

    def local(y0_blk):
        i = (jax.lax.axis_index(AXIS_WALKERS) * ns
             + jax.lax.axis_index(AXIS_SOURCES))
        k_warm = jax.random.fold_in(key, i)
        ids = i * blk + jnp.arange(blk, dtype=jnp.uint32)
        out = run_nuts(lnp_y, y0_blk, k_warm,
                       num_warmup=num_warmup,
                       num_samples=num_samples,
                       pool_axes=axes if pooled else None,
                       return_state=return_state,
                       sampling_key=key, chain_ids=ids, **kw)
        if return_state:
            s, lp, al, eps, dv, (y_run, eps_s, scale) = out
            return (s, lp, al, eps[None], dv[None], y_run,
                    jnp.broadcast_to(eps_s, (blk,)),
                    jnp.broadcast_to(scale, (blk,) + scale.shape))
        s, lp, al, eps, dv = out
        return s, lp, al, eps[None], dv[None]

    specs = (P(None, axes), P(None, axes), P(None, axes),
             P(axes), P(axes))
    if return_state:
        specs = specs + (P(axes), P(axes), P(axes))
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axes),), out_specs=specs,
        check_vma=False)
    out = fn(y0)
    if return_state:
        return out[:5] + ((out[5], out[6], out[7]),)
    return out


def continue_nuts_sharded(lnp_y, state, key, mesh, num_samples,
                          max_doublings=8):
    """Extend warmed-up per-device NUTS replicas without re-warmup.

    ``state`` is the PER-CHAIN ``(y_run (C, D), eps (C,), scale
    (C, D))`` tuple from ``run_nuts_sharded(..., return_state=True)``
    (or a previous call). Each device runs the meshless
    :func:`~lumfuncmcmc_tpu.samplers.nuts.continue_nuts` on its local
    chain block with each chain's own frozen eps/scale and
    PER-GLOBAL-CHAIN key streams (``chain_ids`` = the block's global
    indices) — so the sharded continuation is EXACTLY the meshless
    ``continue_nuts`` of the same chains, under ANY mesh shape whose
    device count divides C (elastic checkpoints: a state written under
    mesh (4,2) resumes bit-identically under (2,4) or (8,1)). This is
    the mesh engine of convergence-controlled NUTS
    (``fit_model_nuts(min_ess=...)`` on the per-device-replica route).

    Returns ``(samples (S, C, D), lnps, alphas, div_frac (ndev,),
    state')``.
    """
    from lumfuncmcmc_tpu.samplers.nuts import continue_nuts

    y_run, eps, scale = state
    ns = mesh.shape[AXIS_SOURCES]
    axes = (AXIS_WALKERS, AXIS_SOURCES)
    blk = _chain_blk(y_run.shape[0], mesh.shape[AXIS_WALKERS] * ns,
                     "device count")

    def local(y_blk, eps_blk, scale_blk):
        i = (jax.lax.axis_index(AXIS_WALKERS) * ns
             + jax.lax.axis_index(AXIS_SOURCES))
        ids = i * blk + jnp.arange(blk, dtype=jnp.uint32)
        s, lp, al, dv, (y_end, eps_e, scale_e) = continue_nuts(
            lnp_y, (y_blk, eps_blk, scale_blk), key,
            num_samples=int(num_samples), max_doublings=max_doublings,
            chain_ids=ids)
        return s, lp, al, dv[None], y_end, eps_e, scale_e

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes)),
        out_specs=(P(None, axes), P(None, axes), P(None, axes),
                   P(axes), P(axes), P(axes), P(axes)),
        check_vma=False)
    s, lp, al, dv, y_end, eps_e, scale_e = fn(y_run, eps, scale)
    return s, lp, al, dv, (y_end, eps_e, scale_e)


def continue_nuts_keys_sharded(lnp_y, state, key, mesh, start, stop,
                               max_doublings=8):
    """Blockwise BIT-IDENTICAL continuation of :func:`run_nuts_sharded`
    — the mesh twin of :func:`~lumfuncmcmc_tpu.samplers.nuts.
    continue_nuts_keys`. Each device slices its chains' counter-stable
    PER-GLOBAL-CHAIN streams, ``sampling_keys(key, start, stop, ids)``
    with ``key`` the run key ``run_nuts_sharded`` was given and ``ids``
    the block's global chain indices — precisely the keys the
    uninterrupted sampling scan would have consumed at transitions
    ``[start, stop)``, under ANY mesh factorization (the streams fold
    by the global chain index, not the device). Concatenated blocks
    therefore equal the uninterrupted
    ``run_nuts_sharded(num_samples=stop)`` run bit-for-bit (the
    fixed-length checkpoint protocol), even when the resume mesh shape
    differs from the writer's. Returns ``(samples, lnps, alphas,
    div_frac (ndev,), state')``.
    """
    from lumfuncmcmc_tpu.samplers.nuts import (
        continue_nuts_keys, sampling_keys)

    y_run, eps, scale = state
    ns = mesh.shape[AXIS_SOURCES]
    axes = (AXIS_WALKERS, AXIS_SOURCES)
    blk = _chain_blk(y_run.shape[0], mesh.shape[AXIS_WALKERS] * ns,
                     "device count")

    def local(y_blk, eps_blk, scale_blk):
        i = (jax.lax.axis_index(AXIS_WALKERS) * ns
             + jax.lax.axis_index(AXIS_SOURCES))
        ids = i * blk + jnp.arange(blk, dtype=jnp.uint32)
        keys = sampling_keys(key, start, stop, ids)
        s, lp, al, dv, (y_end, eps_e, scale_e) = continue_nuts_keys(
            lnp_y, (y_blk, eps_blk, scale_blk), keys, max_doublings)
        return s, lp, al, dv[None], y_end, eps_e, scale_e

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes)),
        out_specs=(P(None, axes), P(None, axes), P(None, axes),
                   P(axes), P(axes), P(axes), P(axes)),
        check_vma=False)
    s, lp, al, dv, y_end, eps_e, scale_e = fn(y_run, eps, scale)
    return s, lp, al, dv, (y_end, eps_e, scale_e)


def _stream_vg_local_parts(ctx: LFContext, layout, ns_shards,
                           interpret):
    """Shared plumbing for the source-sharded streaming value+grad
    routes: returns ``(make_scalar, s_stacked)`` where ``make_scalar``
    must be called INSIDE the shard_map body with this device's source
    blocks and wires the cross-shard psum + custom_vjp into a scalar
    ``theta -> lnprob`` whose value and gradient are globally exact.
    ``None`` when the streaming vg kernel is gated off."""
    from lumfuncmcmc_tpu.ops.pallas_lnlike import (
        make_stream_shard_vg, _vg_scalar_from_rows)

    built = make_stream_shard_vg(ctx, layout, ns_shards,
                                 interpret=interpret)
    if built is None:
        return None
    vg_rows_local, s_stacked, feat_one = built
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def mask_fn(theta, lnl):
        ok = jnp.all((theta >= lo) & (theta <= hi))
        return jnp.where(ok, lnl, -jnp.inf)

    def make_scalar(s_blk):
        s_local = tuple(a[0] for a in s_blk)

        def vg_rows(feats):
            return jax.lax.psum(vg_rows_local(feats, s_local),
                                AXIS_SOURCES)

        return _vg_scalar_from_rows(vg_rows, feat_one, mask_fn)

    return make_scalar, s_stacked


def make_pallas_vg_stream_sharded(ctx: LFContext, layout, mesh,
                                  interpret=False):
    """Batched ``(W, D) -> (lnp (W,), grad (W, D))`` with the catalog
    source-sharded over the mesh: walkers split over the ``walkers``
    axis, each device streaming its 1/nshards source slabs through the
    fused value+grad kernel, one psum of the vg rows per evaluation
    (:func:`~lumfuncmcmc_tpu.ops.pallas_lnlike.make_stream_shard_vg`).
    The standalone gradient surface for mega free-completeness
    catalogs — optimizers/MAP as well as the NUTS route below. Returns
    ``None`` when gated off (fixed completeness or over-VMEM grids).
    """
    parts = _stream_vg_local_parts(ctx, layout,
                                   mesh.shape[AXIS_SOURCES], interpret)
    if parts is None:
        return None
    make_scalar, s_stacked = parts
    nw_shards = mesh.shape[AXIS_WALKERS]

    def local(thetas_blk, s_blk):
        scalar = make_scalar(s_blk)
        return jax.vmap(jax.value_and_grad(scalar))(
            thetas_blk.astype(jnp.float32))

    sharded_fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS_WALKERS),
                  tuple(P(AXIS_SOURCES) for _ in s_stacked)),
        out_specs=(P(AXIS_WALKERS), P(AXIS_WALKERS)),
        check_vma=False)

    def batch(thetas):
        thetas, w = _pad_walkers(thetas, nw_shards)
        v, g = sharded_fn(thetas, s_stacked)
        return v[:w], g[:w]

    batch.engine = "pallas"
    return batch


def run_nuts_stream_sharded(ctx: LFContext, layout, mesh, y0, key,
                            num_warmup, num_samples, pooled=True,
                            interpret=False, **kw):
    """Mega-catalog NUTS with NATIVE 2-D parallelism: chains sharded
    over the ``walkers`` mesh axis, the CATALOG sharded over the
    ``sources`` axis, every device streaming its 1/nshards source slab
    stack through the fused value+grad kernel and one ``psum`` of the
    ``(wk, 1+nfeat)`` vg row reconstructing the exact global
    value+gradient per leapfrog (:func:`~lumfuncmcmc_tpu.ops.
    pallas_lnlike.make_stream_shard_vg`).

    Devices along the source axis hold the SAME chain block and fold
    the SAME key (the walker-axis index only), so their trajectories
    are bit-identical replicas — required for psum coherence inside the
    integrator — while each contributes only its local source shard to
    every gradient. Per-device HBM then holds 1/nshards of the catalog:
    free-completeness NUTS capacity scales with the mesh instead of
    replicating the full catalog per device
    (``run_nuts_sharded`` + the meshless streaming vg kernel).

    ``pooled=True`` pmean-pools dual-averaging/mass across the walker
    axis (one global eps); ``False`` leaves independent per-walker-row
    replicas. ``y0``: (C, D) unconstrained chain starts, C a multiple
    of the walker axis. Returns ``(samples (S, C, D), lnps (S, C),
    alphas (S, C), eps (nw,), div_frac (nw,))`` or ``None`` when the
    model/grids do not fit the streaming kernel (fixed completeness,
    or resident grids past the VMEM budget).

    ``return_state=True`` (via ``kw``) appends the PER-CHAIN
    frozen-adaptation state ``(y_run (C, D), eps (C,), scale (C,
    D))`` — feed it to :func:`continue_nuts_stream_sharded`, under the
    same OR a differently-factored walker axis (the sampling keys fold
    by the global chain index; the SOURCE axis size must stay fixed —
    its psum order is part of the arithmetic). The state is replicated
    along the source axis (bit-identical replicas), so one copy per
    walker row is the whole state.
    """
    from lumfuncmcmc_tpu.samplers.nuts import make_unconstrained, run_nuts

    return_state = bool(kw.pop("return_state", False))
    parts = _stream_vg_local_parts(ctx, layout,
                                   mesh.shape[AXIS_SOURCES], interpret)
    if parts is None:
        return None
    make_scalar, s_stacked = parts
    nw_shards = mesh.shape[AXIS_WALKERS]
    blk = _chain_blk(y0.shape[0], nw_shards, "walker axis")
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def local(y0_blk, s_blk):
        scalar = make_scalar(s_blk)
        lnp_y, _, _ = make_unconstrained(scalar, lo, hi)
        w = jax.lax.axis_index(AXIS_WALKERS)
        # warmup folds by the walker-row index ONLY (source-row devices
        # must stay bit-identical replicas for psum coherence); the
        # sampling phase uses per-global-chain streams
        k_warm = jax.random.fold_in(key, w)
        ids = w * blk + jnp.arange(blk, dtype=jnp.uint32)
        out = run_nuts(
            lnp_y, y0_blk, k_warm, num_warmup=num_warmup,
            num_samples=num_samples,
            pool_axes=(AXIS_WALKERS,) if pooled else None,
            return_state=return_state,
            sampling_key=key, chain_ids=ids, **kw)
        if return_state:
            s, lp, al, eps, dv, (y_run, eps_s, scale) = out
            return (s, lp, al, eps[None], dv[None], y_run,
                    jnp.broadcast_to(eps_s, (blk,)),
                    jnp.broadcast_to(scale, (blk,) + scale.shape))
        s, lp, al, eps, dv = out
        return s, lp, al, eps[None], dv[None]

    specs = (P(None, AXIS_WALKERS), P(None, AXIS_WALKERS),
             P(None, AXIS_WALKERS), P(AXIS_WALKERS), P(AXIS_WALKERS))
    if return_state:
        specs = specs + (P(AXIS_WALKERS), P(AXIS_WALKERS),
                         P(AXIS_WALKERS))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS_WALKERS),
                  tuple(P(AXIS_SOURCES) for _ in s_stacked)),
        out_specs=specs,
        check_vma=False)
    out = fn(y0, s_stacked)
    if return_state:
        return out[:5] + ((out[5], out[6], out[7]),)
    return out


def continue_nuts_stream_sharded(ctx: LFContext, layout, mesh, state,
                                 key, num_samples, interpret=False,
                                 max_doublings=8):
    """Extend a warmed-up source-sharded streaming NUTS run without
    re-warmup — the stream-route twin of :func:`continue_nuts_sharded`.

    ``state`` comes from ``run_nuts_stream_sharded(...,
    return_state=True)`` — per-chain, so it regroups freely when the
    WALKER axis is refactored (the SOURCE axis size must stay fixed:
    its psum order is part of the arithmetic). The gradient surface is
    rebuilt the same way (per-device source slabs + one vg-row
    ``psum`` per leapfrog), and the sampling keys fold by the GLOBAL
    chain index — identical along the source axis, so those devices
    stay bit-identical replicas (the psum-coherence invariant).
    Returns ``(samples, lnps, alphas, div_frac (nw,), state')`` or
    ``None`` when the streaming kernel is gated off (callers hold a
    state, so this only happens on misuse).
    """
    from lumfuncmcmc_tpu.samplers.nuts import (
        continue_nuts, make_unconstrained)

    parts = _stream_vg_local_parts(ctx, layout,
                                   mesh.shape[AXIS_SOURCES], interpret)
    if parts is None:
        return None
    make_scalar, s_stacked = parts
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)
    y_run, eps, scale = state
    blk = _chain_blk(y_run.shape[0], mesh.shape[AXIS_WALKERS],
                     "walker axis")

    def local(y_blk, eps_blk, scale_blk, s_blk):
        scalar = make_scalar(s_blk)
        lnp_y, _, _ = make_unconstrained(scalar, lo, hi)
        ids = (jax.lax.axis_index(AXIS_WALKERS) * blk
               + jnp.arange(blk, dtype=jnp.uint32))
        s, lp, al, dv, (y_end, eps_e, scale_e) = continue_nuts(
            lnp_y, (y_blk, eps_blk, scale_blk), key,
            num_samples=int(num_samples), max_doublings=max_doublings,
            chain_ids=ids)
        return s, lp, al, dv[None], y_end, eps_e, scale_e

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS_WALKERS), P(AXIS_WALKERS), P(AXIS_WALKERS),
                  tuple(P(AXIS_SOURCES) for _ in s_stacked)),
        out_specs=(P(None, AXIS_WALKERS), P(None, AXIS_WALKERS),
                   P(None, AXIS_WALKERS), P(AXIS_WALKERS),
                   P(AXIS_WALKERS), P(AXIS_WALKERS), P(AXIS_WALKERS)),
        check_vma=False)
    s, lp, al, dv, y_end, eps_e, scale_e = fn(y_run, eps, scale,
                                              s_stacked)
    return s, lp, al, dv, (y_end, eps_e, scale_e)


def continue_nuts_keys_stream_sharded(ctx: LFContext, layout, mesh,
                                      state, key, start, stop,
                                      interpret=False,
                                      max_doublings=8):
    """Blockwise BIT-IDENTICAL continuation of
    :func:`run_nuts_stream_sharded` (the stream-route twin of
    :func:`continue_nuts_keys_sharded`). Keys fold by the GLOBAL chain
    index — identical along the source axis, so those devices slice
    the same stream and stay bit-identical replicas (the
    psum-coherence invariant), and the walker axis may be refactored
    between blocks (the source axis size is pinned: psum order).
    Returns ``(samples, lnps, alphas, div_frac (nw,), state')`` or
    ``None`` when the streaming kernel is gated off (misuse: callers
    hold a state from the run, so the gate must already have passed).
    """
    from lumfuncmcmc_tpu.samplers.nuts import (
        continue_nuts_keys, make_unconstrained, sampling_keys)

    parts = _stream_vg_local_parts(ctx, layout,
                                   mesh.shape[AXIS_SOURCES], interpret)
    if parts is None:
        return None
    make_scalar, s_stacked = parts
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)
    y_run, eps, scale = state
    blk = _chain_blk(y_run.shape[0], mesh.shape[AXIS_WALKERS],
                     "walker axis")

    def local(y_blk, eps_blk, scale_blk, s_blk):
        scalar = make_scalar(s_blk)
        lnp_y, _, _ = make_unconstrained(scalar, lo, hi)
        ids = (jax.lax.axis_index(AXIS_WALKERS) * blk
               + jnp.arange(blk, dtype=jnp.uint32))
        keys = sampling_keys(key, start, stop, ids)
        s, lp, al, dv, (y_end, eps_e, scale_e) = continue_nuts_keys(
            lnp_y, (y_blk, eps_blk, scale_blk), keys, max_doublings)
        return s, lp, al, dv[None], y_end, eps_e, scale_e

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS_WALKERS), P(AXIS_WALKERS), P(AXIS_WALKERS),
                  tuple(P(AXIS_SOURCES) for _ in s_stacked)),
        out_specs=(P(None, AXIS_WALKERS), P(None, AXIS_WALKERS),
                   P(None, AXIS_WALKERS), P(AXIS_WALKERS),
                   P(AXIS_WALKERS), P(AXIS_WALKERS), P(AXIS_WALKERS)),
        check_vma=False)
    s, lp, al, dv, y_end, eps_e, scale_e = fn(y_run, eps, scale,
                                              s_stacked)
    return s, lp, al, dv, (y_end, eps_e, scale_e)


def make_pallas_lnprob_stream_sharded(ctx: LFContext, layout, mesh,
                                      interpret=False):
    """TRUE 2-D native parallelism for free-completeness mega
    catalogs: walkers sharded over the ``walkers`` mesh axis, sources
    ROUND-ROBIN SHARDED over the ``sources`` axis, and every device
    running the HBM-streaming Pallas kernel on its local slab stack.
    One ``psum`` over the source axis per evaluation (the grid
    integral is pre-scaled 1/nshards so the psum reconstructs
    ``lnpart - fullint`` exactly — see ``prepare_stream_shard_data``).

    This is the native-tier counterpart of the XLA sharded path's
    source axis: per-device HBM holds 1/nshards of the catalog, so
    capacity scales with the mesh. Returns ``None`` when the model is
    not free-completeness single-epoch or the resident grids exceed
    VMEM (those configurations keep the other paths).
    """
    from lumfuncmcmc_tpu.ops.pallas_lnlike import (
        _clamp_flim, make_stream_shard_batched)

    if bool(layout.fix_comp):
        return None
    ns_shards = mesh.shape[AXIS_SOURCES]
    nw_shards = mesh.shape[AXIS_WALKERS]
    batched, s_stacked = make_stream_shard_batched(
        ctx, layout, ns_shards, interpret=interpret)
    if batched is None:
        return None
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def local(thetas_blk, s_blk):
        thetas_blk = thetas_blk.astype(jnp.float32)
        s_local = tuple(a[0] for a in s_blk)   # (1, SR, 128) -> (SR, 128)
        lnl = batched(_clamp_flim(thetas_blk, layout), s_local)
        lnl = jax.lax.psum(lnl, AXIS_SOURCES)
        ok = jnp.all((thetas_blk >= lo) & (thetas_blk <= hi), axis=1)
        return jnp.where(ok, lnl, -jnp.inf)

    sharded_fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS_WALKERS),
                  tuple(P(AXIS_SOURCES) for _ in s_stacked)),
        out_specs=P(AXIS_WALKERS), check_vma=False)

    def batch(thetas):
        thetas, w = _pad_walkers(thetas, nw_shards)
        return sharded_fn(thetas, s_stacked)[:w]

    batch.engine = "pallas"
    return batch


def run_tempered_sharded(lnprior_fn, lnlike_fn, pos0, betas, key,
                         nsteps, mesh, a=2.0, move="stretch",
                         de_prob=0.5):
    """Evidence ladder sharded over the device mesh — whole rungs
    one-(or more-)per-device, the multi-chip deployment of
    :func:`~lumfuncmcmc_tpu.samplers.tempering.run_tempered`.
    Embarrassingly parallel (rungs never communicate); the β integrals
    happen on the gathered host lnl chains. Key handling matches
    ``run_tempered`` (one split per rung), so the sharded ladder
    reproduces the unsharded one exactly.

    ``pos0``: (K, W, D) with K a multiple of the mesh device count.
    Returns the same ``(chains, lnls, acc)`` triple.
    """
    from lumfuncmcmc_tpu.samplers.tempering import _rung_runner

    K = pos0.shape[0]
    ndev = mesh.shape[AXIS_WALKERS] * mesh.shape[AXIS_SOURCES]
    if K % ndev:
        raise ValueError(
            f"rung count {K} must be a multiple of the mesh device "
            f"count {ndev} (whole rungs per device)")
    one = _rung_runner(lnprior_fn, lnlike_fn, nsteps, a=a, move=move,
                       de_prob=de_prob)
    keys = jax.random.split(key, K)
    axes = (AXIS_WALKERS, AXIS_SOURCES)

    def local(pos_blk, keys_blk, betas_blk):
        return jax.vmap(one)(pos_blk, keys_blk, betas_blk)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axes), P(axes), P(axes)),
                       out_specs=P(axes), check_vma=False)
    return fn(pos0, keys, jnp.asarray(betas, pos0.dtype))


def run_parallel_tempering_sharded(lnprior_fn, lnlike_fn, pos0, betas,
                                   key, nsteps, mesh,
                                   swap_every: int = 10, a=2.0,
                                   move="stretch", de_prob=0.5):
    """Replica-exchange parallel tempering with the ladder sharded
    over the device mesh — contiguous rung blocks per device, DEO
    swaps crossing device boundaries through ghost-rung exchange.

    Every device runs its R = K/ndev rungs' sampling blocks locally;
    at each DEO phase it all-gathers the tiny per-device boundary
    states (first/last rung position+lnl — the only cross-device
    traffic, riding ICI), extends its block with the left neighbor's
    last and right neighbor's first rung, and applies the SAME
    vectorized :func:`~lumfuncmcmc_tpu.samplers.tempering.
    _pair_swap_block` update with ghost pairs masked by their global
    index. The per-rung sampling keys and the swap uniforms are
    computed identically on every device from the same key (split
    children/counter-stable streams), so the sharded run is
    BIT-IDENTICAL to the meshless
    :func:`~lumfuncmcmc_tpu.samplers.tempering.
    run_parallel_tempering` — the parity test pins it.

    Returns ``(chains (K, nsteps', W, D), lnls, acc (K, W),
    swap_frac (K-1,))`` exactly like the meshless variant.
    """
    from lumfuncmcmc_tpu.samplers.tempering import (
        _pair_swap_block, _rung_runner)

    if swap_every <= 0:
        raise ValueError("swap_every must be positive")
    nrounds = nsteps // swap_every
    if nrounds < 1:
        raise ValueError(
            f"nsteps={nsteps} < swap_every={swap_every}: no full "
            "round would run")
    K, W, D = pos0.shape
    ns = mesh.shape[AXIS_SOURCES]
    nw = mesh.shape[AXIS_WALKERS]
    ndev = nw * ns
    if K % ndev:
        raise ValueError(
            f"rung count {K} must be a multiple of the mesh device "
            f"count {ndev} (whole rungs per device)")
    R = K // ndev
    axes = (AXIS_WALKERS, AXIS_SOURCES)
    betas_a = jnp.asarray(betas, pos0.dtype)
    db = betas_a[1:] - betas_a[:-1]                      # (K-1,)
    # pad the pair tables by one row each side so the ghost-extended
    # slice [g0-1, g0+R-1] stays in bounds on the edge devices (ghost
    # pairs there are masked off, values never used)
    zero = jnp.zeros((1,), db.dtype)
    db_pad = jnp.concatenate([zero, db, zero])           # row j: g=j-1
    one = _rung_runner(lnprior_fn, lnlike_fn, swap_every, a=a,
                       move=move, de_prob=de_prob)

    def gather2(x):
        g = jax.lax.all_gather(x, AXIS_SOURCES)
        g = jax.lax.all_gather(g, AXIS_WALKERS)
        return g.reshape((ndev,) + x.shape)              # d = w*ns + s

    def local(pos_blk):
        d = (jax.lax.axis_index(AXIS_WALKERS) * ns
             + jax.lax.axis_index(AXIS_SOURCES))
        g0 = d * R

        def round_body(carry, inp):
            (pos,) = carry
            k_r, phase = inp
            k_blk, k_swap = jax.random.split(k_r)
            keys_all = jax.random.split(k_blk, K)  # same on every dev
            keys_blk = jax.lax.dynamic_slice_in_dim(keys_all, g0, R, 0)
            betas_blk = jax.lax.dynamic_slice_in_dim(betas_a, g0, R, 0)
            ch, lnl, acc = jax.vmap(one)(pos, keys_blk, betas_blk)
            pos_c, lnl_c = ch[:, -1], lnl[:, -1]
            # ghost rungs: left neighbor's LAST, right neighbor's FIRST
            lasts_p, firsts_p = gather2(pos_c[-1]), gather2(pos_c[0])
            lasts_l, firsts_l = gather2(lnl_c[-1]), gather2(lnl_c[0])
            left_p = lasts_p[jnp.clip(d - 1, 0, ndev - 1)]
            left_l = lasts_l[jnp.clip(d - 1, 0, ndev - 1)]
            right_p = firsts_p[jnp.clip(d + 1, 0, ndev - 1)]
            right_l = firsts_l[jnp.clip(d + 1, 0, ndev - 1)]
            ext_p = jnp.concatenate([left_p[None], pos_c,
                                     right_p[None]])     # (R+2, W, D)
            ext_l = jnp.concatenate([left_l[None], lnl_c,
                                     right_l[None]])
            # ext pair i has left global index g0-1+i, i = 0..R
            u_all = jax.random.uniform(k_swap, (K - 1, W), pos.dtype)
            ones = jnp.ones((1, W), pos.dtype)
            u_pad = jnp.concatenate([ones, u_all, ones])  # row j: g=j-1
            u_rows = jax.lax.dynamic_slice_in_dim(u_pad, g0, R + 1, 0)
            db_rows = jax.lax.dynamic_slice_in_dim(db_pad, g0,
                                                   R + 1, 0)
            gE = g0 - 1 + jnp.arange(R + 1)
            active = ((gE >= 0) & (gE < K - 1)
                      & ((gE % 2) == phase))
            ext_p2, _, do = _pair_swap_block(ext_p, ext_l, db_rows,
                                             u_rows, active)
            # pair stats owned by the LEFT device: rows i=1..R are the
            # pairs with local left rungs (g = g0..g0+R-1)
            return ((ext_p2[1:R + 1],),
                    (ch, lnl, acc, do[1:].astype(pos.dtype)))

        keys_r = jax.random.split(key, nrounds)
        phases = jnp.arange(nrounds) % 2
        ((_,), (chs, lnls, accs, sw)) = jax.lax.scan(
            round_body, (pos_blk,), (keys_r, phases))
        chains = jnp.moveaxis(chs, 0, 1).reshape(
            R, nrounds * swap_every, W, D)
        lnls_o = jnp.moveaxis(lnls, 0, 1).reshape(
            R, nrounds * swap_every, W)
        acc = jnp.sum(accs, axis=0)
        sw_tot = jnp.sum(jnp.mean(sw, axis=2), axis=0)   # (R,)
        return chains, lnls_o, acc, sw_tot

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axes),),
        out_specs=(P(axes), P(axes), P(axes), P(axes)),
        check_vma=False)
    chains, lnls, acc, sw_tot = fn(pos0)
    # last global row is the nonexistent pair K-1 (always masked)
    sw_tot = jnp.asarray(sw_tot)[:K - 1]
    active_counts = jnp.asarray(
        [(nrounds + (1 if k % 2 == 0 else 0)) // 2
         for k in range(K - 1)], sw_tot.dtype)
    return (chains, lnls, acc,
            sw_tot / jnp.maximum(active_counts, 1.0))


def run_stretch_ensembles_sharded(lnprob_batch, pos0, key, nsteps,
                                  mesh, a=2.0, thin=1, move="stretch",
                                  de_prob=0.5, de_sel=None):
    """C independent replicated ensembles sharded over the device mesh
    — one (or more) whole ensembles per device, the multi-chip
    deployment for SMALL posteriors where sharding a single ensemble's
    walker batch would leave devices underfed. Embarrassingly parallel:
    zero collectives in the hot loop; the cross-ensemble Gelman-Rubin
    happens on the gathered host chains.

    ``pos0``: (C, nwalkers, ndim) with C a multiple of the mesh device
    count. ``lnprob_batch`` must be a per-device batch form (vmap of
    the scalar, or the Pallas batched kernel) — NOT a shard_map
    construction. Key handling matches
    :func:`~lumfuncmcmc_tpu.samplers.affine.run_stretch_ensembles`
    (one split per ensemble), so the sharded run reproduces the
    unsharded one exactly.

    Returns the same tuple with a leading C axis on every output.
    """
    from lumfuncmcmc_tpu.samplers.affine import run_stretch

    C = pos0.shape[0]
    ndev = mesh.shape[AXIS_WALKERS] * mesh.shape[AXIS_SOURCES]
    if C % ndev:
        raise ValueError(
            f"ensemble count {C} must be a multiple of the mesh device "
            f"count {ndev} (whole ensembles per device)")
    keys = jax.random.split(key, C)
    axes = (AXIS_WALKERS, AXIS_SOURCES)

    def local_run(pos_blk, keys_blk):
        def one(p, k):
            state, chain, lnps, acc = run_stretch(
                lnprob_batch, p, k, nsteps, a, thin, move, de_prob,
                de_sel)
            return state.pos, state.lnp, chain, lnps, acc
        return jax.vmap(one)(pos_blk, keys_blk)

    fn = jax.shard_map(local_run, mesh=mesh,
                       in_specs=(P(axes), P(axes)),
                       out_specs=P(axes), check_vma=False)
    last_pos, last_lnp, chain, lnps, acc = fn(pos0, keys)
    from lumfuncmcmc_tpu.samplers.affine import EnsembleState
    return EnsembleState(last_pos, last_lnp), chain, lnps, acc


def make_pallas_lnprob_sharded(ctx: LFContext, layout, mesh,
                               model="single", interpret=False):
    """Compose the native tier with the device mesh: each device runs
    the full fused Pallas lnprob kernel on its local walker block
    (SURVEY.md:150 — quadrature-parallel Pallas blocks *inside*
    walker-parallel ``shard_map``).

    The walker axis is sharded over BOTH mesh axes (grid and source
    arrays fit in a single device's VMEM whenever the Pallas builder
    succeeds, so the source mesh axis is better spent on extra walker
    parallelism than on redundant replicated work). Returns ``None``
    when the workload exceeds the kernel's VMEM gate — mega catalogs
    keep the XLA path of :func:`make_lnprob_sharded`, which genuinely
    shards the source axis.

    ``check_vma=False``: the output of ``pallas_call`` carries no
    varying-mesh-axes annotation, so shard_map's replication checker
    cannot prove the (true) fact that the result only varies along the
    sharded walker dimension.
    """
    from lumfuncmcmc_tpu.ops import pallas_lnlike as _pk

    builder = {"single": _pk.make_pallas_lnprob,
               "z": _pk.make_pallas_lnprob_z,
               "hier": _pk.make_pallas_lnprob_h}[model]
    inner = builder(ctx, layout, interpret=interpret)
    if getattr(inner, "engine", None) != "pallas":
        return None  # VMEM-gated fallback — use the XLA sharded path
    ndev = mesh.shape[AXIS_WALKERS] * mesh.shape[AXIS_SOURCES]
    axes = (AXIS_WALKERS, AXIS_SOURCES)
    sharded_fn = jax.shard_map(
        inner, mesh=mesh, in_specs=P(axes), out_specs=P(axes),
        check_vma=False)

    def batch(thetas):
        thetas, w = _pad_walkers(thetas, ndev)
        return sharded_fn(thetas)[:w]

    batch.engine = "pallas"
    return batch
