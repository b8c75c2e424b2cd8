"""Fused Pallas TPU kernels for the single-epoch log-likelihood.

The hot path of the flagship model evaluates, per walker theta:

    lnpart  = sum_n [ ln phi(L_n) + ln Omega(L_n, z_n | theta) ]
    fullint = sum_{f,i,j} phi(logL[f,i,j]) * Omega(logf[f,i,j] | theta)
              * w[f,i,j]
    lnlike  = lnpart - fullint

This is the framework's "native tier" (SURVEY.md §2, native-components
row): the reference has no native code, so its TPU-native equivalent is a
hand-scheduled kernel for the likelihood reduction
(``lumfuncmcmc.py:360-393``).

Why the kernel beats the (already well-fused) XLA path — the wins are
*mathematical restructurings XLA cannot perform* plus layout control:

1. **Exp factorization.** Every theta-independent exponential is
   precomputed host-side: ``P = 10^(logL - Lref)`` and
   ``R = 10^(logf - logf_ref)`` live in VMEM as grid arrays, so the
   Schechter cutoff ``10^(logL - Lstar) = P * 10^(Lref - Lstar)`` and the
   Fleming decay ratio ``f/f_tau = R * 10^(logf_ref - log_ftau)`` become
   per-element *multiplies* by per-walker scalars instead of per-element
   ``exp``s. (``exp(a-b) -> exp(a)*exp(-b)`` is not a float-semantics
   -preserving rewrite, so XLA never does it.) Per grid element this
   leaves 2 exp + 1 log + 1 rsqrt (free completeness) or a single exp
   (fixed completeness) versus ~5 exp + 1 log under XLA.
2. **Walker-vectorized broadcast tiles.** Cell arrays are stored
   (1, C) with cells along lanes; per program all 8 walkers of a block
   compute together as (8, 1) theta columns broadcast against (1, C)
   cell rows — one fat (8, C) op chain per field, no per-walker loop.
   When the (1, C) layout would overflow VMEM (sublane padding costs
   8x), a per-walker (rows, 128) slab variant takes over — still
   whole-slab chains, just serialized over the 8 walkers. (A
   row-at-a-time fori_loop variant measured 3-10x slower than either.)
3. **Static per-field slabs.** Grid cells and sources are packed
   per-field at prepare time (rows padded to sublane multiples), so
   per-field theta (logF50_f, decay scale) enters as an SMEM scalar —
   no per-element field-id selects (the previous kernel burned ~10
   full-grid select passes per walker on these).
4. **Zero HBM round-trips.** All grid/source arrays use constant index
   maps: Mosaic keeps them VMEM-resident across walker programs, and
   every transcendental feeds the accumulator without materializing an
   intermediate.

Numerics: the factored form regroups exponentials, so it matches the
XLA path to float32 rounding (~1e-6 relative on lnL), not bitwise.
Padding cells carry ``w = 0`` and ``P = 1e30`` (forcing ``exp -> 0``), so
they contribute exactly zero without NaNs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lumfuncmcmc_tpu.models.context import LFContext
from lumfuncmcmc_tpu.cosmology import SQARCSEC_PER_SR
from lumfuncmcmc_tpu.ops.completeness import _log10_inverse_fleming_ratio
from lumfuncmcmc_tpu.ops.schechter import LN10

_LOG_LN10 = float(np.log(LN10))
_LOGF_REF = -16.0       # reference log10-flux for the R factorization
_P_PAD = 1.0e30         # pad value of P: forces exp(... - P*t1) -> 0

BLK_W = 8               # default walkers per program (sublane dimension)
_BIG_BATCH = 256        # batch size where taller blocks take over
_BLK_W_MAX = 256        # tallest block considered for large batches
_TEMP_BUDGET = 1 << 20  # per-op-chain temporary target in bytes: blocks
                        # are grown until a (blk, chunk) f32 temp hits
                        # ~1 MiB — past that Mosaic spills the ~10 live
                        # temporaries and throughput drops (v5e A/B:
                        # trapz peaks at blk=64 with 4096-wide chunks,
                        # gauss at blk=256 with 1024-wide chunks —
                        # docs/PERFORMANCE.md walker-scaling table)
LANES = 128             # grid cells per VPU op (lane dimension)
_CHUNK = 4096           # broadcast-kernel cells per op chain (temp bound;
                        # tuned on v5e in the full-chain context — 2048
                        # looked better in a dispatch-bound microbench
                        # but measured worse inside the real sampler)
_CHUNK_ROWS = 32        # slab-kernel rows per op chain (32 x 128 = the
                        # same 4096-cell temp bound; also keeps mega
                        # -catalog source slabs from exhausting VMEM)
_VMEM_ARRAY_LIMIT = 10 * 2**20   # resident-array budget before the
                                 # kernel defers to the XLA path


def _round_up(x, m):
    return -(-x // m) * m


def _clamp_flim(theta, layout):
    """Keep theta's Flim block positive for the ``log10`` in the
    feature maps (out-of-box thetas are masked by the caller). Shared
    by the forward and gradient paths so the clamp floor and the
    fixed-parameter offset rule cannot drift apart."""
    if layout.fix_comp:
        return theta
    nf = layout.nfields
    k = 2 if layout.fix_sch_al else 3
    flim = jnp.maximum(theta[..., k:k + nf], 1e-6)
    return jnp.concatenate([theta[..., :k], flim, theta[..., k + nf:]],
                           axis=-1)


def _pad_walkers(thetas, b):
    """Pad a (W, D) theta batch to a multiple of block ``b`` by
    repeating row 0 (padded rows are sliced off after the kernel)."""
    wk_in = thetas.shape[0]
    wk = _round_up(wk_in, b)
    if wk != wk_in:
        thetas = jnp.concatenate(
            [thetas, jnp.broadcast_to(thetas[:1],
                                      (wk - wk_in,) + thetas.shape[1:])])
    return thetas


def _ln_fc(logf, r, ac, lf50, t2, fcmin):
    """ln Fleming completeness for a cell block. ``ac``/``lf50``/``t2``
    broadcast as per-walker scalars or (blk, 1) columns. fc is clamped
    away from 0 (matching the XLA path, ``ops/completeness.py``) so an
    underflow cannot turn an in-bounds lnlike into -inf on one engine
    only; shared by every forward kernel so the numerics cannot drift.
    """
    x = ac * (logf - lf50)
    fc = jnp.maximum(0.5 + 0.5 * x * jax.lax.rsqrt(1.0 + x * x), 1e-30)
    lf = jnp.log(fc)
    if not fcmin:
        return lf
    return lf / (1.0 - jnp.exp(-(r * t2)))


def _choose_blk(wk_in, blk, flat=True, max_chunk=_CHUNK):
    """Walker-block size for a batch of ``wk_in`` thetas. ``blk`` forces
    a size (experiments/tests); None auto-selects — 8 for production
    half-ensembles, and for large batches the tallest block whose
    (blk, max_chunk) op-chain temporary stays within ``_TEMP_BUDGET``
    (taller broadcast ops amortize per-program setup until the live
    temporaries spill) AND whose round-up padding wastes at most ~1/8 of
    the batch (a 300-theta half-ensemble must not pad to 512). The slab
    layout serializes walkers inside the program, so its temporaries
    don't scale with blk — it keeps the default."""
    if blk is not None:
        return int(blk)
    if not flat or wk_in < _BIG_BATCH:
        return BLK_W
    b = _BLK_W_MAX
    while b > BLK_W and (b * max_chunk * 4 > _TEMP_BUDGET
                         or _round_up(wk_in, b) - wk_in > wk_in // 8):
        b //= 2
    return b


# ---------------------------------------------------------------------------
# data preparation (host side, once per context)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PallasGridData:
    """Tile-packed per-field device buffers for the kernels.

    Two layouts share this container:
    - ``flat=True`` (broadcast kernels): arrays are (1, C) with cells
      along lanes; ``grid_rows[f]`` is each field's (cell offset, cell
      count), offsets multiples of 128.
    - ``flat=False`` (slab kernels): arrays are (NR, 128) with each
      field's cells flattened and row-padded; ``grid_rows[f]`` is (row
      offset, row count).
    Source arrays are packed the same way (sources sorted by field at
    prepare time).
    """

    g_logf: jnp.ndarray    # (GR, 128) log10 flux of grid cells
    g_a: jnp.ndarray       # (GR, 128) LN10 * logL
    g_p: jnp.ndarray       # (GR, 128) 10^(logL - lref)
    g_r: jnp.ndarray       # (GR, 128) 10^(logf - logf_ref)
    g_w: jnp.ndarray       # (GR, 128) quadrature weight * area * ln10
    s_logf: jnp.ndarray    # (SR, 128)
    s_a: jnp.ndarray       # (SR, 128) LN10 * lum
    s_p: jnp.ndarray       # (SR, 128) 10^(lum - lref)
    s_r: jnp.ndarray       # (SR, 128)
    s_lnom0: jnp.ndarray   # (SR, 128) ln(Omega0_src / sqarcsec)
    s_mask: jnp.ndarray    # (SR, 128)
    grid_rows: tuple       # ((off, n), ...) per field — static
    src_rows: tuple        # ((off, n), ...) per field — static
    lref: float
    nfields: int
    flat: bool


jax.tree_util.register_pytree_node(
    PallasGridData,
    lambda d: ((d.g_logf, d.g_a, d.g_p, d.g_r, d.g_w, d.s_logf, d.s_a,
                d.s_p, d.s_r, d.s_lnom0, d.s_mask),
               (d.grid_rows, d.src_rows, d.lref, d.nfields, d.flat)),
    lambda aux, ch: PallasGridData(*ch, grid_rows=aux[0], src_rows=aux[1],
                                   lref=aux[2], nfields=aux[3],
                                   flat=aux[4]),
)


def _pack_rows(per_field_cols, fills, row_align=8):
    """Pack per-field 1-D cell arrays into stacked (rows, 128) blocks.

    ``per_field_cols``: list over fields of dicts name -> 1-D array.
    ``row_align=8`` keeps per-field static slices tile-aligned (right for
    the big grid slabs); 1 packs tightly (right for the small per-field
    source blocks, where 8-row padding would multiply the work ~8x).
    Returns (dict name -> (NR, 128) float32, ((off, n_rows), ...)).
    """
    names = list(fills.keys())
    blocks = {nm: [] for nm in names}
    rows = []
    off = 0
    for cols in per_field_cols:
        n = len(cols[names[0]])
        n_p = _round_up(max(n, 1), LANES * row_align)
        nr = n_p // LANES
        for nm in names:
            buf = np.full(n_p, fills[nm], dtype=np.float32)
            buf[:n] = cols[nm]
            blocks[nm].append(buf.reshape(nr, LANES))
        rows.append((off, nr))
        off += nr
    packed = {nm: jnp.asarray(np.concatenate(blocks[nm], axis=0))
              for nm in names}
    return packed, tuple(rows)


def _pack_flat(per_field_cols, fills):
    """Pack per-field 1-D cell arrays into (1, C) lane-major rows for the
    broadcast kernels; per-field offsets are 128-multiples."""
    names = list(fills.keys())
    blocks = {nm: [] for nm in names}
    cells = []
    off = 0
    for cols in per_field_cols:
        n = len(cols[names[0]])
        n_p = _round_up(max(n, 1), LANES)
        for nm in names:
            buf = np.full(n_p, fills[nm], dtype=np.float32)
            buf[:n] = cols[nm]
            blocks[nm].append(buf)
        cells.append((off, n_p))
        off += n_p
    packed = {nm: jnp.asarray(np.concatenate(blocks[nm])[None, :])
              for nm in names}
    return packed, tuple(cells)


_GFILLS = {"logf": -30.0, "a": 0.0, "p": _P_PAD, "r": 1.0, "w": 0.0}


def free_comp_over_vmem(ctx: LFContext) -> bool:
    """True when the free-completeness resident layout (5 grid + 6
    source arrays, f32) exceeds the VMEM budget — the boundary between
    the resident kernels and the streaming/source-sharded tiers.
    Reads ``_VMEM_ARRAY_LIMIT`` dynamically (tests monkeypatch it)."""
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    nsrc = int(np.asarray(ctx.lum).shape[0])
    return (ncells * 5 + nsrc * 6) * 4 > _VMEM_ARRAY_LIMIT


def _grid_cols(ctx: LFContext, fix_comp: bool, lref: float):
    """Per-field grid feature dicts shared by every grid pack.

    Free completeness folds the per-field area fraction and the ln10
    Schechter prefactor into the weights; fixed completeness uses the
    frozen ``w_fixed`` (area and Omega already inside) times ln10.
    """
    logL = np.asarray(ctx.logL_grid, dtype=np.float64)
    nf = logL.shape[0]
    if fix_comp:
        w = np.asarray(ctx.w_fixed, dtype=np.float64) * LN10
        logf = np.zeros_like(logL) + _LOGF_REF
    else:
        om0_f = np.asarray(ctx.omega0_f, dtype=np.float64) / SQARCSEC_PER_SR
        w = (np.asarray(ctx.w_open, dtype=np.float64)
             * om0_f[:, None, None] * LN10)
        logf = np.asarray(ctx.logf_grid, dtype=np.float64)
    gcols = []
    for f in range(nf):
        ll, lf = logL[f].ravel(), logf[f].ravel()
        gcols.append({
            "logf": lf, "a": LN10 * ll,
            "p": 10.0 ** np.clip(ll - lref, -30.0, 25.0),
            "r": 10.0 ** np.clip(lf - _LOGF_REF, -30.0, 25.0),
            "w": w[f].ravel(),
        })
    return gcols


def prepare_pallas_data(ctx: LFContext, fix_comp: bool,
                        flat: bool = True,
                        src_row_align: int = 1) -> PallasGridData:
    """Flatten/pad the context grids into the kernel layout.

    ``src_row_align`` pads each field's source rows to that multiple
    (the streaming kernel needs fields aligned to whole slabs).
    """
    lref = float(ctx.lref)
    nf = int(np.asarray(ctx.logL_grid).shape[0])
    gcols = _grid_cols(ctx, fix_comp, lref)
    gfills = _GFILLS
    gpack, grid_rows = (_pack_flat(gcols, gfills) if flat
                        else _pack_rows(gcols, gfills))

    # sources, sorted by field (stable, preserves in-field order)
    fid = np.asarray(ctx.field_id)
    lum = np.asarray(ctx.lum, dtype=np.float64)
    logf_s = np.asarray(ctx.logf_src, dtype=np.float64)
    om0_s = np.asarray(ctx.omega0_src, dtype=np.float64) / SQARCSEC_PER_SR
    mask = np.asarray(ctx.src_mask, dtype=np.float64)
    scols = []
    for f in range(nf):
        sel = np.nonzero(fid == f)[0]
        scols.append({
            "logf": logf_s[sel], "a": LN10 * lum[sel],
            "p": 10.0 ** np.clip(lum[sel] - lref, -30.0, 25.0),
            "r": 10.0 ** np.clip(logf_s[sel] - _LOGF_REF, -30.0, 25.0),
            "lnom0": np.log(np.maximum(om0_s[sel], 1e-300)),
            "mask": mask[sel],
        })
    sfills = {"logf": -30.0, "a": 0.0, "p": _P_PAD, "r": 1.0,
              "lnom0": 0.0, "mask": 0.0}
    spack, src_rows = (_pack_flat(scols, sfills) if flat
                       else _pack_rows(scols, sfills,
                                       row_align=src_row_align))

    return PallasGridData(
        g_logf=gpack["logf"], g_a=gpack["a"], g_p=gpack["p"],
        g_r=gpack["r"], g_w=gpack["w"],
        s_logf=spack["logf"], s_a=spack["a"], s_p=spack["p"],
        s_r=spack["r"], s_lnom0=spack["lnom0"], s_mask=spack["mask"],
        grid_rows=grid_rows, src_rows=src_rows, lref=lref,
        nfields=int(nf), flat=flat,
    )


def prepare_stream_shard_data(ctx: LFContext, nshards: int):
    """Source-sharded streaming layout (free completeness): the grid
    pack of :func:`prepare_pallas_data` with quadrature weights scaled
    by ``1/nshards`` — each shard's kernel then computes
    ``lnpart_shard - fullint/nshards``, so a ``psum`` over shards
    yields exactly ``lnpart - fullint`` — plus ``nshards`` source
    packs with a SHARED static row layout: each field's sources are
    split round-robin and padded to the per-field ceiling, so
    ``src_rows``/``slab_starts`` are identical on every device (the
    kernel is SPMD; only the streamed slab DATA differs).

    Returns ``(gpack, grid_rows, s_stacked, src_rows, lref, nfields)``
    with ``s_stacked`` a dict name -> (nshards, SR, 128) array.
    """
    lref = float(ctx.lref)
    nf = int(np.asarray(ctx.logL_grid).shape[0])
    gcols = _grid_cols(ctx, fix_comp=False, lref=lref)
    for cols in gcols:
        cols["w"] = cols["w"] / float(nshards)
    gpack, grid_rows = _pack_rows(gcols, _GFILLS)

    fid = np.asarray(ctx.field_id)
    lum = np.asarray(ctx.lum, dtype=np.float64)
    logf_s = np.asarray(ctx.logf_src, dtype=np.float64)
    om0_s = np.asarray(ctx.omega0_src, dtype=np.float64) / SQARCSEC_PER_SR
    mask = np.asarray(ctx.src_mask, dtype=np.float64)
    vals = {"logf": logf_s, "a": LN10 * lum,
            "p": 10.0 ** np.clip(lum - lref, -30.0, 25.0),
            "r": 10.0 ** np.clip(logf_s - _LOGF_REF, -30.0, 25.0),
            "lnom0": np.log(np.maximum(om0_s, 1e-300)), "mask": mask}
    sfills = {"logf": -30.0, "a": 0.0, "p": _P_PAD, "r": 1.0,
              "lnom0": 0.0, "mask": 0.0}
    sel_f = [np.nonzero(fid == f)[0] for f in range(nf)]
    nmax_f = [max(1, -(-len(s) // nshards)) for s in sel_f]
    blocks = {nm: [] for nm in sfills}
    src_rows = None
    for k in range(nshards):
        scols = []
        for f in range(nf):
            idx = sel_f[f][k::nshards]
            cols = {}
            for nm, fill in sfills.items():
                buf = np.full(nmax_f[f], fill, dtype=np.float64)
                buf[:len(idx)] = vals[nm][idx]
                cols[nm] = buf
            scols.append(cols)
        spack_k, rows_k = _pack_rows(scols, sfills,
                                     row_align=_SLAB_ROWS)
        if src_rows is None:
            src_rows = rows_k
        else:
            assert rows_k == src_rows  # shared-layout invariant
        for nm in sfills:
            blocks[nm].append(spack_k[nm])
    s_stacked = {nm: jnp.stack(b) for nm, b in blocks.items()}
    return gpack, grid_rows, s_stacked, src_rows, lref, nf


def make_stream_shard_batched(ctx: LFContext, layout, nshards: int,
                              interpret: bool = False, blk=None):
    """Per-device batched lnlike for the source-sharded streaming
    layout. Returns ``(batched, s_stacked)``: ``batched(thetas,
    s_local)`` evaluates the LOCAL shard's contribution
    (``lnpart_local - fullint/nshards``) with ``s_local`` the tuple of
    this device's (SR, 128) source blocks; the caller psums across the
    source mesh axis (``parallel/sharding.py::
    make_pallas_lnprob_stream_sharded``). Returns ``(None, None)``
    when the resident grid arrays alone exceed the VMEM budget.
    """
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    if ncells * 5 * 4 > _VMEM_ARRAY_LIMIT:
        return None, None
    gpack, grid_rows, s_stacked, src_rows, lref, nf = \
        prepare_stream_shard_data(ctx, nshards)
    fcmin = float(layout.fcmin) if layout.fcmin else 0.0
    sr = int(s_stacked["a"].shape[1])
    n_slabs = sr // _SLAB_ROWS
    slab_starts = tuple(off // _SLAB_ROWS for off, _ in src_rows)
    kern = partial(_kernel_free_stream, grid_rows=grid_rows,
                   slab_starts=slab_starts, nfields=nf, fcmin=fcmin)
    g_arrays = (gpack["logf"], gpack["a"], gpack["p"], gpack["r"],
                gpack["w"])
    s_names = ("logf", "a", "p", "r", "lnom0", "mask")

    def batched(thetas, s_local):
        wk_in = thetas.shape[0]
        b = _choose_blk(wk_in, blk, flat=False)
        thetas = _pad_walkers(thetas, b)
        feats = _features_free(thetas, layout, lref,
                               fcmin).astype(jnp.float32)
        nfeat = feats.shape[1]
        out = pl.pallas_call(
            kern,
            grid=(thetas.shape[0] // b, n_slabs),
            in_specs=[pl.BlockSpec((b, nfeat), lambda i, j: (i, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM) for a in g_arrays]
            + [pl.BlockSpec((_SLAB_ROWS, LANES), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM) for _ in s_names],
            out_specs=pl.BlockSpec((b, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((thetas.shape[0], 1),
                                           jnp.float32),
            interpret=interpret,
        )(feats, *g_arrays, *s_local)
        return out[:wk_in, 0]

    return batched, tuple(s_stacked[nm] for nm in s_names)


@dataclass(frozen=True)
class PallasZData:
    """Packed buffers for the z-evolving kernel (fixed completeness:
    Omega lives in the frozen weights). Same flat/slab layout convention
    as :class:`PallasGridData`."""

    g_a: jnp.ndarray       # LN10 * logL per grid cell
    g_z: jnp.ndarray       # z per grid cell
    g_z2: jnp.ndarray      # z^2 per grid cell
    g_w: jnp.ndarray       # frozen w_fixed (see note below: NO ln10)
    s_a: jnp.ndarray
    s_z: jnp.ndarray
    s_z2: jnp.ndarray
    s_lnom0: jnp.ndarray   # ln Omega_src (frozen)
    s_mask: jnp.ndarray
    flat: bool
    # g_w is the frozen w_fixed UNscaled — ln(ln10) lives in the shared
    # _z_logphi constant feature (the source term needs it), so folding
    # ln10 into the weights too would double-count it


jax.tree_util.register_pytree_node(
    PallasZData,
    lambda d: ((d.g_a, d.g_z, d.g_z2, d.g_w, d.s_a, d.s_z, d.s_z2,
                d.s_lnom0, d.s_mask), (d.flat,)),
    lambda aux, ch: PallasZData(*ch, flat=aux[0]),
)


def prepare_pallas_z_data(ctx: LFContext, flat: bool = True) -> PallasZData:
    """Pack the z-model grids: per-field z nodes broadcast along the L
    axis (``lnlike_z``'s ``ctx.zarr[:, None, :]``), weights = frozen
    ``w_fixed`` (area + Omega inside) with NO ln10 fold — the shared
    ``_z_logphi`` constant feature already carries ln(ln10)."""
    logL = np.asarray(ctx.logL_grid, dtype=np.float64)   # (F, S, S)
    zarr = np.asarray(ctx.zarr, dtype=np.float64)        # (F, S)
    # NO ln10 fold here: the shared _z_logphi carries ln(ln10) in its
    # constant feature (the source term needs it), so folding it into
    # the weights too would double-count it in the integral
    w = np.asarray(ctx.w_fixed, dtype=np.float64)
    nf = logL.shape[0]
    zgrid = np.broadcast_to(zarr[:, None, :], logL.shape)

    gcols = [{"a": LN10 * logL[f].ravel(), "z": zgrid[f].ravel(),
              "z2": (zgrid[f] ** 2).ravel(), "w": w[f].ravel()}
             for f in range(nf)]
    gfills = {"a": 500.0, "z": 0.0, "z2": 0.0, "w": 0.0}
    pack = _pack_flat if flat else _pack_rows
    gpack, _ = pack(gcols, gfills)

    lum = np.asarray(ctx.lum, dtype=np.float64)
    zsrc = np.asarray(ctx.zsrc, dtype=np.float64)
    lnom = np.asarray(ctx.ln_om_src, dtype=np.float64)
    mask = np.asarray(ctx.src_mask, dtype=np.float64)
    scols = [{"a": LN10 * lum, "z": zsrc, "z2": zsrc ** 2,
              "lnom0": lnom, "mask": mask}]
    sfills = {"a": 500.0, "z": 0.0, "z2": 0.0, "lnom0": 0.0, "mask": 0.0}
    spack, _ = pack(scols, sfills)

    return PallasZData(
        g_a=gpack["a"], g_z=gpack["z"], g_z2=gpack["z2"], g_w=gpack["w"],
        s_a=spack["a"], s_z=spack["z"], s_z2=spack["z2"],
        s_lnom0=spack["lnom0"], s_mask=spack["mask"], flat=flat,
    )


@dataclass(frozen=True)
class PallasZ2Data:
    """2-D layout for the big-grid z kernel: per field the (S_L, S_z)
    panel keeps z along lanes, so the quadratics AND the theta-dependent
    Schechter-cutoff scale ``t1(z) = 10^(lref - Lstar(z))`` are computed
    per z-NODE row and broadcast down the L rows — one exp per grid
    element (the same factorization as the single-epoch kernels, hoisted
    per node because Lstar varies with z). Sources stay in the 1-D
    packed layout (few, and their z is per-source anyway)."""

    g_a2: jnp.ndarray      # (GR, ZP) LN10 * logL
    g_p2: jnp.ndarray      # (GR, ZP) 10^(logL - lref)
    g_w2: jnp.ndarray      # (GR, ZP) frozen w_fixed (NO ln10 fold)
    zrow: jnp.ndarray      # (F, ZP) z nodes per field
    z2row: jnp.ndarray     # (F, ZP) z^2
    s_a: jnp.ndarray       # 1-D packed sources, as PallasZData
    s_z: jnp.ndarray
    s_z2: jnp.ndarray
    s_lnom0: jnp.ndarray
    s_mask: jnp.ndarray
    grid_rows: tuple       # ((row offset, n rows), ...) per field
    lref: float


jax.tree_util.register_pytree_node(
    PallasZ2Data,
    lambda d: ((d.g_a2, d.g_p2, d.g_w2, d.zrow, d.z2row, d.s_a, d.s_z,
                d.s_z2, d.s_lnom0, d.s_mask), (d.grid_rows, d.lref)),
    lambda aux, ch: PallasZ2Data(*ch, grid_rows=aux[0], lref=aux[1]),
)


def prepare_pallas_z2_data(ctx: LFContext) -> PallasZ2Data:
    logL = np.asarray(ctx.logL_grid, dtype=np.float64)   # (F, SL, SZ)
    zarr = np.asarray(ctx.zarr, dtype=np.float64)        # (F, SZ)
    w = np.asarray(ctx.w_fixed, dtype=np.float64)        # NO ln10 fold
    nf, sl, sz = logL.shape
    lref = float(ctx.lref)
    sl_p = _round_up(sl, 8)
    zp = _round_up(sz, LANES)

    def pad2(a, fill):
        out = np.full((sl_p, zp), fill, dtype=np.float32)
        out[:sl, :sz] = a
        return out

    g_a2 = np.concatenate([pad2(LN10 * logL[f], 0.0) for f in range(nf)])
    g_p2 = np.concatenate(
        [pad2(10.0 ** np.clip(logL[f] - lref, -30.0, 25.0), _P_PAD)
         for f in range(nf)])
    g_w2 = np.concatenate([pad2(w[f], 0.0) for f in range(nf)])
    grid_rows = tuple((f * sl_p, sl_p) for f in range(nf))
    zrow = np.zeros((nf, zp), dtype=np.float32)
    zrow[:, :sz] = zarr

    # sources: the 1-D packed layout of prepare_pallas_z_data
    lum = np.asarray(ctx.lum, dtype=np.float64)
    zsrc = np.asarray(ctx.zsrc, dtype=np.float64)
    scols = [{"a": LN10 * lum, "z": zsrc, "z2": zsrc ** 2,
              "lnom0": np.asarray(ctx.ln_om_src, dtype=np.float64),
              "mask": np.asarray(ctx.src_mask, dtype=np.float64)}]
    sfills = {"a": 500.0, "z": 0.0, "z2": 0.0, "lnom0": 0.0, "mask": 0.0}
    spack, _ = _pack_rows(scols, sfills, row_align=1)

    return PallasZ2Data(
        g_a2=jnp.asarray(g_a2), g_p2=jnp.asarray(g_p2),
        g_w2=jnp.asarray(g_w2), zrow=jnp.asarray(zrow),
        z2row=jnp.asarray(zrow ** 2),
        s_a=spack["a"], s_z=spack["z"], s_z2=spack["z2"],
        s_lnom0=spack["lnom0"], s_mask=spack["mask"],
        grid_rows=grid_rows, lref=lref,
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _kernel_free_bcast(th_ref, g_logf, g_a, g_p, g_r, g_w,
                       s_logf, s_a, s_p, s_r, s_lnom0, s_mask,
                       out_ref, *, grid_rows, src_rows, nfields, fcmin):
    """Broadcast-layout free-completeness lnlike: all 8 walkers of the
    block compute together, (8, 1) theta columns against (1, C) cell
    rows. Feature columns as in :func:`_kernel_free`."""
    c_g = th_ref[:, 0:1]
    c_s = th_ref[:, 1:2]
    aA = th_ref[:, 2:3]
    lA = th_ref[:, 3:4]
    t1 = th_ref[:, 4:5]
    ac = th_ref[:, 5:6]

    tot = jnp.zeros((th_ref.shape[0], 1), jnp.float32)
    for f in range(nfields):
        lf50 = th_ref[:, 6 + f:7 + f]
        t2 = th_ref[:, 6 + nfields + f:7 + nfields + f]

        def ln_fc(logf, r):
            return _ln_fc(logf, r, ac, lf50, t2, fcmin)

        go, gn = grid_rows[f]
        # static chunks bound the live (8, chunk) temporaries (~10 are
        # alive at once; whole-field chains on 101^2-cell grids pushed
        # VMEM past the resident arrays)
        for co in range(0, gn, _CHUNK):
            cn = min(_CHUNK, gn - co)
            lo = go + co
            e = (c_g + aA * (g_a[0:1, lo:lo + cn] - lA)
                 - g_p[0:1, lo:lo + cn] * t1
                 + ln_fc(g_logf[0:1, lo:lo + cn], g_r[0:1, lo:lo + cn]))
            tot = tot - jnp.sum(jnp.exp(e) * g_w[0:1, lo:lo + cn],
                                axis=1, keepdims=True)

        so, sn = src_rows[f]
        contrib = (c_s + aA * (s_a[0:1, so:so + sn] - lA)
                   - s_p[0:1, so:so + sn] * t1
                   + s_lnom0[0:1, so:so + sn]
                   + ln_fc(s_logf[0:1, so:so + sn],
                           s_r[0:1, so:so + sn]))
        tot = tot + jnp.sum(jnp.where(s_mask[0:1, so:so + sn] > 0.0,
                                      contrib, 0.0),
                            axis=1, keepdims=True)

    out_ref[:, :] = tot


def _z_logphi(a, z, z2, th):
    """ln phi(logL, z) for the z model from the quadratic-coefficient
    features: th rows per walker are
    [LN10*ap, LN10*bp, LN10*cp + ln(ln10), LN10*aL, LN10*bL, LN10*cL,
     sch_al + 1]. Works for (8, 1) x (1, C) broadcast or scalar x slab.
    """
    lq = th[3] * z2 + th[4] * z + th[5]          # LN10 * Lstar(z)
    x = a - lq                                   # LN10 * (logL - Lstar)
    return th[0] * z2 + th[1] * z + th[2] + th[6] * x - jnp.exp(x)


def _kernel_z_bcast(th_ref, g_a, g_z, g_z2, g_w,
                    s_a, s_z, s_z2, s_lnom0, s_mask, out_ref):
    th = [th_ref[:, j:j + 1] for j in range(7)]
    gn = g_a.shape[1]
    tot = jnp.zeros((th_ref.shape[0], 1), jnp.float32)
    for co in range(0, gn, _CHUNK):
        cn = min(_CHUNK, gn - co)
        lnphi = _z_logphi(g_a[0:1, co:co + cn], g_z[0:1, co:co + cn],
                          g_z2[0:1, co:co + cn], th)
        tot = tot - jnp.sum(jnp.exp(lnphi) * g_w[0:1, co:co + cn],
                            axis=1, keepdims=True)
    contrib = _z_logphi(s_a[0:1, :], s_z[0:1, :], s_z2[0:1, :], th) \
        + s_lnom0[0:1, :]
    tot = tot + jnp.sum(jnp.where(s_mask[0:1, :] > 0.0, contrib, 0.0),
                        axis=1, keepdims=True)
    out_ref[:, :] = tot


def _kernel_z2_slab(th_ref, g_a2, g_p2, g_w2, zrow, z2row,
                    s_a, s_z, s_z2, s_lnom0, s_mask, out_ref, *,
                    grid_rows, lref_a):
    """2-D-layout z kernel: per field the quadratics Lq(z), P(z) and the
    cutoff scale t1(z) = exp(LN10*lref - Lq(z)) are (1, ZP) node rows;
    the per-element work drops to one exp plus a few fmas (the inner
    10^(logL - Lstar(z)) is g_p2 * t1 — a multiply)."""
    nfields = len(grid_rows)
    for i in range(th_ref.shape[0]):
        th = [th_ref[i, j] for j in range(7)]
        tot = jnp.float32(0.0)
        for f in range(nfields):
            zr = zrow[f:f + 1, :]
            z2r = z2row[f:f + 1, :]
            lq = th[3] * z2r + th[4] * zr + th[5]     # LN10 * Lstar(z)
            pr = th[0] * z2r + th[1] * zr + th[2]     # phistar part
            t1 = jnp.exp(lref_a - lq)
            base = pr - th[6] * lq                    # hoist -a1*Lq
            go, gn = grid_rows[f]
            for ro in range(0, gn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, gn - ro)
                lo = go + ro
                e = (base + th[6] * g_a2[lo:lo + rn, :]
                     - g_p2[lo:lo + rn, :] * t1)
                tot = tot - jnp.sum(jnp.exp(e) * g_w2[lo:lo + rn, :])
        sn = s_a.shape[0]
        for ro in range(0, sn, _CHUNK_ROWS):
            rn = min(_CHUNK_ROWS, sn - ro)
            contrib = _z_logphi(s_a[ro:ro + rn, :], s_z[ro:ro + rn, :],
                                s_z2[ro:ro + rn, :], th) \
                + s_lnom0[ro:ro + rn, :]
            tot = tot + jnp.sum(jnp.where(s_mask[ro:ro + rn, :] > 0.0,
                                          contrib, 0.0))
        out_ref[i, 0] = tot


def _kernel_hier_bcast(th_ref, g_a, g_p, g_w, out_ref, *, grid_rows):
    """Hierarchical-model integral sum: per-field (Lstar_f, phistar_f)
    on field f's frozen fixed-completeness grid. Features per walker:
    [aA, lnrest] + per field [c_f, lA_f, t1_f] (lnrest carries the
    collapsed ln-terms + hyperprior, computed outside)."""
    aA = th_ref[:, 0:1]
    tot = th_ref[:, 1:2]
    for f, (go, gn) in enumerate(grid_rows):
        c = th_ref[:, 2 + 3 * f:3 + 3 * f]
        lA = th_ref[:, 3 + 3 * f:4 + 3 * f]
        t1 = th_ref[:, 4 + 3 * f:5 + 3 * f]
        for co in range(0, gn, _CHUNK):
            cn = min(_CHUNK, gn - co)
            lo = go + co
            e = (c + aA * (g_a[0:1, lo:lo + cn] - lA)
                 - g_p[0:1, lo:lo + cn] * t1)
            tot = tot - jnp.sum(jnp.exp(e) * g_w[0:1, lo:lo + cn],
                                axis=1, keepdims=True)
    out_ref[:, :] = tot


def _kernel_hier_slab(th_ref, g_a, g_p, g_w, out_ref, *, grid_rows):
    for i in range(th_ref.shape[0]):
        aA = th_ref[i, 0]
        tot = th_ref[i, 1]
        for f, (go, gn) in enumerate(grid_rows):
            c = th_ref[i, 2 + 3 * f]
            lA = th_ref[i, 3 + 3 * f]
            t1 = th_ref[i, 4 + 3 * f]
            for ro in range(0, gn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, gn - ro)
                lo = go + ro
                e = (c + aA * (g_a[lo:lo + rn, :] - lA)
                     - g_p[lo:lo + rn, :] * t1)
                tot = tot - jnp.sum(jnp.exp(e) * g_w[lo:lo + rn, :])
        out_ref[i, 0] = tot


def _kernel_fixed_bcast(th_ref, g_a, g_p, g_w, out_ref):
    """Broadcast-layout fixed-completeness lnlike; features as in
    :func:`_kernel_fixed`."""
    e = (th_ref[:, 0:1] + th_ref[:, 1:2] * (g_a[0:1, :] - th_ref[:, 2:3])
         - g_p[0:1, :] * th_ref[:, 3:4])
    out_ref[:, :] = (th_ref[:, 4:5]
                     - jnp.sum(jnp.exp(e) * g_w[0:1, :],
                               axis=1, keepdims=True))


def _kernel_free(th_ref, g_logf, g_a, g_p, g_r, g_w,
                 s_logf, s_a, s_p, s_r, s_lnom0, s_mask,
                 out_ref, *, grid_rows, src_rows, nfields, fcmin):
    """Free-completeness lnlike for a block of 8 walkers.

    Feature columns (see ``_features_free``):
      0 c_grid = LN10*phistar          3 lA = LN10*Lstar
      1 c_src  = ln(ln10) + LN10*phistar   4 t1 = 10^(lref - Lstar)
      2 aA = sch_al + 1                5 alpha_c
      6+f      logF50_f
      6+F+f    t2_f = 10^(logf_ref - log_ftau_f)
    """
    for i in range(th_ref.shape[0]):
        c_g = th_ref[i, 0]
        c_s = th_ref[i, 1]
        aA = th_ref[i, 2]
        lA = th_ref[i, 3]
        t1 = th_ref[i, 4]
        ac = th_ref[i, 5]

        tot = jnp.float32(0.0)
        for f in range(nfields):
            lf50 = th_ref[i, 6 + f]
            t2 = th_ref[i, 6 + nfields + f]

            def ln_fc(logf, r):
                return _ln_fc(logf, r, ac, lf50, t2, fcmin)

            go, gn = grid_rows[f]
            for ro in range(0, gn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, gn - ro)
                lo = go + ro
                e = (c_g + aA * (g_a[lo:lo + rn, :] - lA)
                     - g_p[lo:lo + rn, :] * t1
                     + ln_fc(g_logf[lo:lo + rn, :], g_r[lo:lo + rn, :]))
                tot = tot - jnp.sum(jnp.exp(e) * g_w[lo:lo + rn, :])

            so, sn = src_rows[f]
            for ro in range(0, sn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, sn - ro)
                lo = so + ro
                contrib = (c_s + aA * (s_a[lo:lo + rn, :] - lA)
                           - s_p[lo:lo + rn, :] * t1
                           + s_lnom0[lo:lo + rn, :]
                           + ln_fc(s_logf[lo:lo + rn, :],
                                   s_r[lo:lo + rn, :]))
                tot = tot + jnp.sum(
                    jnp.where(s_mask[lo:lo + rn, :] > 0.0, contrib, 0.0))

        out_ref[i, 0] = tot


def _kernel_fixed(th_ref, g_a, g_p, g_w, out_ref):
    """Fixed-completeness fullint for a block of 8 walkers; the O(1)
    collapsed ln-term arrives precomputed in feature column 4, so the
    kernel emits the complete lnlike.

    Features: [c_grid, aA, lA, t1, lnpart].
    """
    nr = g_a.shape[0]
    for i in range(th_ref.shape[0]):
        tot = th_ref[i, 4]
        for ro in range(0, nr, _CHUNK_ROWS):
            rn = min(_CHUNK_ROWS, nr - ro)
            e = (th_ref[i, 0]
                 + th_ref[i, 1] * (g_a[ro:ro + rn, :] - th_ref[i, 2])
                 - g_p[ro:ro + rn, :] * th_ref[i, 3])
            tot = tot - jnp.sum(jnp.exp(e) * g_w[ro:ro + rn, :])
        out_ref[i, 0] = tot


def _kernel_free_vg(th_ref, g_logf, g_a, g_p, g_r, g_w,
                    s_logf, s_a, s_p, s_r, s_lnom0, s_mask,
                    out_ref, *, grid_rows, src_rows, nfields, fcmin):
    """Fused value + feature-gradient for the free-completeness lnlike
    (the native tier's gradient path — NUTS). Output columns are
    [lnlike, d/d(feat_0) .. d/d(feat_{6+2F-1})] in the feature order of
    :func:`_feat_free_one`; the cheap feature map's pullback to theta is
    left to XLA autodiff (``make_pallas_lnprob_and_grad``).

    Per grid element the extra work over the forward kernel is ~5 fma
    chains and 5 more chunk reductions — no additional transcendentals
    (u^3 reuses the rsqrt, the t2-derivative reuses exp(-r t2)), so the
    factored-exponential advantage over XLA's forward+backward carries
    over. Padding stays exact-zero: pad cells have w = 0 / mask = 0 and
    every reduction term carries that factor (fc is clamped away from 0
    so no 0 * inf NaNs).
    """
    F = nfields
    for i in range(th_ref.shape[0]):
        c_g = th_ref[i, 0]
        c_s = th_ref[i, 1]
        aA = th_ref[i, 2]
        lA = th_ref[i, 3]
        t1 = th_ref[i, 4]
        ac = th_ref[i, 5]
        lnl = jnp.float32(0.0)
        d_cg = jnp.float32(0.0)
        d_cs = jnp.float32(0.0)
        d_aA = jnp.float32(0.0)
        d_lA = jnp.float32(0.0)
        d_t1 = jnp.float32(0.0)
        d_ac = jnp.float32(0.0)
        for f in range(F):
            lf50 = th_ref[i, 6 + f]
            t2 = th_ref[i, 6 + F + f]
            d_lf = jnp.float32(0.0)
            d_t2 = jnp.float32(0.0)

            def fc_terms(logf, r):
                """(ln fc, d ln fc/dx, d ln fc/d t2) per element."""
                x = ac * (logf - lf50)
                u = jax.lax.rsqrt(1.0 + x * x)
                fc = jnp.maximum(0.5 + 0.5 * x * u, 1e-30)
                lfc = jnp.log(fc)
                dfx = 0.5 * u * u * u / fc
                if not fcmin:
                    return lfc, dfx, jnp.zeros_like(lfc)
                q = jnp.exp(-(r * t2))
                inv_d = 1.0 / (1.0 - q)
                return (lfc * inv_d, dfx * inv_d,
                        -lfc * (r * q) * inv_d * inv_d)

            go, gn = grid_rows[f]
            for ro in range(0, gn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, gn - ro)
                lo = go + ro
                logf = g_logf[lo:lo + rn, :]
                lnfc, dfx, dft = fc_terms(logf, g_r[lo:lo + rn, :])
                am = g_a[lo:lo + rn, :] - lA
                p = g_p[lo:lo + rn, :]
                e = (jnp.exp(c_g + aA * am - p * t1 + lnfc)
                     * g_w[lo:lo + rn, :])
                s0 = jnp.sum(e)
                lnl = lnl - s0
                d_cg = d_cg - s0
                d_lA = d_lA + aA * s0
                d_aA = d_aA - jnp.sum(e * am)
                d_t1 = d_t1 + jnp.sum(e * p)
                d_ac = d_ac - jnp.sum(e * dfx * (logf - lf50))
                d_lf = d_lf + ac * jnp.sum(e * dfx)
                d_t2 = d_t2 - jnp.sum(e * dft)

            so, sn = src_rows[f]
            for ro in range(0, sn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, sn - ro)
                lo = so + ro
                m = s_mask[lo:lo + rn, :]
                logf = s_logf[lo:lo + rn, :]
                lnfc, dfx, dft = fc_terms(logf, s_r[lo:lo + rn, :])
                am = s_a[lo:lo + rn, :] - lA
                p = s_p[lo:lo + rn, :]
                contrib = (c_s + aA * am - p * t1
                           + s_lnom0[lo:lo + rn, :] + lnfc)
                lnl = lnl + jnp.sum(jnp.where(m > 0.0, contrib, 0.0))
                s0 = jnp.sum(m)
                d_cs = d_cs + s0
                d_lA = d_lA - aA * s0
                d_aA = d_aA + jnp.sum(m * am)
                d_t1 = d_t1 - jnp.sum(m * p)
                d_ac = d_ac + jnp.sum(m * dfx * (logf - lf50))
                d_lf = d_lf - ac * jnp.sum(m * dfx)
                d_t2 = d_t2 + jnp.sum(m * dft)

            out_ref[i, 7 + f] = d_lf
            out_ref[i, 7 + F + f] = d_t2
        out_ref[i, 0] = lnl
        out_ref[i, 1] = d_cg
        out_ref[i, 2] = d_cs
        out_ref[i, 3] = d_aA
        out_ref[i, 4] = d_lA
        out_ref[i, 5] = d_t1
        out_ref[i, 6] = d_ac


_SLAB_ROWS = 64         # streamed source-slab height (64 x 128 = 8192
                        # sources per slab; 6 arrays x 2 double-buffered
                        # slabs = 384 KB in flight)


def _kernel_free_stream(th_ref, g_logf, g_a, g_p, g_r, g_w,
                        s_logf, s_a, s_p, s_r, s_lnom0, s_mask,
                        out_ref, *, grid_rows, slab_starts, nfields,
                        fcmin):
    """Free-completeness lnlike for catalogs whose source arrays exceed
    VMEM: the quadrature grids stay resident (constant index maps) while
    the per-source arrays stream from HBM one (SLAB_ROWS, 128) slab per
    inner grid step — Mosaic double-buffers the loads, so the kernel
    stays compute-bound (~0.4 ms HBM vs ~2 ms transcendentals per
    100-walker batch at 10^6 sources).

    Grid = (walker_blocks, n_slabs): walkers outer so the (blk, 1)
    output block accumulates across consecutive inner steps (init +
    grid integral at slab 0). Slabs are FIELD-ALIGNED (each field's
    rows padded to a slab multiple, ``slab_starts`` static), so the
    per-field theta scalars are one dynamic SMEM lookup per program —
    no per-element field-id selects.
    """
    j = pl.program_id(1)
    f_idx = jnp.int32(0)
    for f in range(1, nfields):
        f_idx = f_idx + jnp.where(j >= slab_starts[f], 1, 0)

    @pl.when(j == 0)
    def _init():
        # full resident-grid integral + accumulator init
        for i in range(th_ref.shape[0]):
            c_g = th_ref[i, 0]
            aA = th_ref[i, 2]
            lA = th_ref[i, 3]
            t1 = th_ref[i, 4]
            ac = th_ref[i, 5]
            tot = jnp.float32(0.0)
            for f in range(nfields):
                lf50 = th_ref[i, 6 + f]
                t2 = th_ref[i, 6 + nfields + f]
                go, gn = grid_rows[f]
                for ro in range(0, gn, _CHUNK_ROWS):
                    rn = min(_CHUNK_ROWS, gn - ro)
                    lo = go + ro
                    lfc = _ln_fc(g_logf[lo:lo + rn, :],
                                 g_r[lo:lo + rn, :], ac, lf50, t2, fcmin)
                    e = (c_g + aA * (g_a[lo:lo + rn, :] - lA)
                         - g_p[lo:lo + rn, :] * t1 + lfc)
                    tot = tot - jnp.sum(jnp.exp(e) * g_w[lo:lo + rn, :])
            out_ref[i, 0] = tot

    for i in range(th_ref.shape[0]):
        c_s = th_ref[i, 1]
        aA = th_ref[i, 2]
        lA = th_ref[i, 3]
        t1 = th_ref[i, 4]
        ac = th_ref[i, 5]
        lf50 = th_ref[i, 6 + f_idx]
        t2 = th_ref[i, 6 + nfields + f_idx]
        tot = jnp.float32(0.0)
        for ro in range(0, _SLAB_ROWS, _CHUNK_ROWS):
            rn = min(_CHUNK_ROWS, _SLAB_ROWS - ro)
            lfc = _ln_fc(s_logf[ro:ro + rn, :], s_r[ro:ro + rn, :],
                         ac, lf50, t2, fcmin)
            contrib = (c_s + aA * (s_a[ro:ro + rn, :] - lA)
                       - s_p[ro:ro + rn, :] * t1
                       + s_lnom0[ro:ro + rn, :] + lfc)
            tot = tot + jnp.sum(
                jnp.where(s_mask[ro:ro + rn, :] > 0.0, contrib, 0.0))
        out_ref[i, 0] = out_ref[i, 0] + tot


def _kernel_free_stream_vg(th_ref, g_logf, g_a, g_p, g_r, g_w,
                           s_logf, s_a, s_p, s_r, s_lnom0, s_mask,
                           out_ref, *, grid_rows, slab_starts, nfields,
                           fcmin):
    """Fused value + feature-gradient for catalogs past the VMEM gate:
    the gradient-path analogue of :func:`_kernel_free_stream` (same
    field-aligned HBM slab streaming, resident grids) with the
    accumulator set of :func:`_kernel_free_vg`. This closes the last
    mega-scale gap — free-completeness NUTS at 10^6 sources previously
    fell back to XLA forward+backward, which reads every source array
    from HBM twice per leapfrog and writes residuals between the
    passes; the fused kernel streams them once.

    Output columns as in ``_kernel_free_vg``. The slab's field index is
    dynamic (program_id), so the per-field gradient columns are updated
    through a static loop with a ``where(f == f_idx)`` mask — Mosaic
    SMEM stores need static indices.
    """
    j = pl.program_id(1)
    F = nfields
    f_idx = jnp.int32(0)
    for f in range(1, F):
        f_idx = f_idx + jnp.where(j >= slab_starts[f], 1, 0)

    def fc_terms(logf, r, ac, lf50, t2):
        x = ac * (logf - lf50)
        u = jax.lax.rsqrt(1.0 + x * x)
        fc = jnp.maximum(0.5 + 0.5 * x * u, 1e-30)
        lfc = jnp.log(fc)
        dfx = 0.5 * u * u * u / fc
        if not fcmin:
            return lfc, dfx, jnp.zeros_like(lfc)
        q = jnp.exp(-(r * t2))
        inv_d = 1.0 / (1.0 - q)
        return (lfc * inv_d, dfx * inv_d,
                -lfc * (r * q) * inv_d * inv_d)

    @pl.when(j == 0)
    def _init():
        # resident-grid integral: every accumulator initialized here
        for i in range(th_ref.shape[0]):
            c_g = th_ref[i, 0]
            aA = th_ref[i, 2]
            lA = th_ref[i, 3]
            t1 = th_ref[i, 4]
            ac = th_ref[i, 5]
            lnl = jnp.float32(0.0)
            d_cg = jnp.float32(0.0)
            d_aA = jnp.float32(0.0)
            d_lA = jnp.float32(0.0)
            d_t1 = jnp.float32(0.0)
            d_ac = jnp.float32(0.0)
            for f in range(F):
                lf50 = th_ref[i, 6 + f]
                t2 = th_ref[i, 6 + F + f]
                d_lf = jnp.float32(0.0)
                d_t2 = jnp.float32(0.0)
                go, gn = grid_rows[f]
                for ro in range(0, gn, _CHUNK_ROWS):
                    rn = min(_CHUNK_ROWS, gn - ro)
                    lo = go + ro
                    logf = g_logf[lo:lo + rn, :]
                    lnfc, dfx, dft = fc_terms(logf, g_r[lo:lo + rn, :],
                                              ac, lf50, t2)
                    am = g_a[lo:lo + rn, :] - lA
                    p = g_p[lo:lo + rn, :]
                    e = (jnp.exp(c_g + aA * am - p * t1 + lnfc)
                         * g_w[lo:lo + rn, :])
                    s0 = jnp.sum(e)
                    lnl = lnl - s0
                    d_cg = d_cg - s0
                    d_lA = d_lA + aA * s0
                    d_aA = d_aA - jnp.sum(e * am)
                    d_t1 = d_t1 + jnp.sum(e * p)
                    d_ac = d_ac - jnp.sum(e * dfx * (logf - lf50))
                    d_lf = d_lf + ac * jnp.sum(e * dfx)
                    d_t2 = d_t2 - jnp.sum(e * dft)
                out_ref[i, 7 + f] = d_lf
                out_ref[i, 7 + F + f] = d_t2
            out_ref[i, 0] = lnl
            out_ref[i, 1] = d_cg
            out_ref[i, 2] = jnp.float32(0.0)
            out_ref[i, 3] = d_aA
            out_ref[i, 4] = d_lA
            out_ref[i, 5] = d_t1
            out_ref[i, 6] = d_ac

    for i in range(th_ref.shape[0]):
        c_s = th_ref[i, 1]
        aA = th_ref[i, 2]
        lA = th_ref[i, 3]
        t1 = th_ref[i, 4]
        ac = th_ref[i, 5]
        lf50 = th_ref[i, 6 + f_idx]
        t2 = th_ref[i, 6 + F + f_idx]
        lnl = jnp.float32(0.0)
        d_cs = jnp.float32(0.0)
        d_aA = jnp.float32(0.0)
        d_t1 = jnp.float32(0.0)
        d_ac = jnp.float32(0.0)
        d_lf = jnp.float32(0.0)
        d_t2 = jnp.float32(0.0)
        for ro in range(0, _SLAB_ROWS, _CHUNK_ROWS):
            rn = min(_CHUNK_ROWS, _SLAB_ROWS - ro)
            m = s_mask[ro:ro + rn, :]
            logf = s_logf[ro:ro + rn, :]
            lnfc, dfx, dft = fc_terms(logf, s_r[ro:ro + rn, :],
                                      ac, lf50, t2)
            am = s_a[ro:ro + rn, :] - lA
            p = s_p[ro:ro + rn, :]
            contrib = (c_s + aA * am - p * t1
                       + s_lnom0[ro:ro + rn, :] + lnfc)
            lnl = lnl + jnp.sum(jnp.where(m > 0.0, contrib, 0.0))
            d_cs = d_cs + jnp.sum(m)
            d_aA = d_aA + jnp.sum(m * am)
            d_t1 = d_t1 - jnp.sum(m * p)
            d_ac = d_ac + jnp.sum(m * dfx * (logf - lf50))
            d_lf = d_lf - ac * jnp.sum(m * dfx)
            d_t2 = d_t2 + jnp.sum(m * dft)
        out_ref[i, 0] = out_ref[i, 0] + lnl
        out_ref[i, 2] = out_ref[i, 2] + d_cs
        out_ref[i, 3] = out_ref[i, 3] + d_aA
        out_ref[i, 4] = out_ref[i, 4] - aA * d_cs
        out_ref[i, 5] = out_ref[i, 5] + d_t1
        out_ref[i, 6] = out_ref[i, 6] + d_ac
        for f in range(F):
            sel = f_idx == f
            out_ref[i, 7 + f] = (out_ref[i, 7 + f]
                                 + jnp.where(sel, d_lf, 0.0))
            out_ref[i, 7 + F + f] = (out_ref[i, 7 + F + f]
                                     + jnp.where(sel, d_t2, 0.0))


def _kernel_z_vg(th_ref, g_a2, g_p2, g_w2, zrow, z2row,
                 s_a, s_z, s_z2, s_lnom0, s_mask, out_ref, *,
                 grid_rows, lref_a):
    """Fused value + feature-gradient for the z-evolving lnlike in the
    per-z-node hoisted 2-D layout (same trick as :func:`_kernel_z2_slab`:
    the quadratics and the cutoff scale t1(z) are (1, ZP) node rows, so
    the per-element work is one exp plus a few fmas). Features are the 7
    quadratic coefficients of :func:`_feat_z_one`; output columns
    [lnlike, d/d(th_0..6)].

    The gradient reductions factorize over the L rows: with
    r = dlnphi/dx = th6 - P*t1 and x = a - Lq(z),
    sum E*z^k, sum E*r*z^k and sum E*x all follow from three column
    sums (colE, col(E*P), col(E*a)) contracted against the z-node rows
    — so the per-element cost of the gradient is two extra multiplies.
    """
    for i in range(th_ref.shape[0]):
        th = [th_ref[i, j] for j in range(7)]
        lnl = jnp.float32(0.0)
        d = [jnp.float32(0.0) for _ in range(7)]
        for f, (go, gn) in enumerate(grid_rows):
            zr = zrow[f:f + 1, :]
            z2r = z2row[f:f + 1, :]
            lq = th[3] * z2r + th[4] * zr + th[5]      # LN10 * Lstar(z)
            pr = th[0] * z2r + th[1] * zr + th[2]
            t1 = jnp.exp(lref_a - lq)
            base = pr - th[6] * lq
            zp = zr.shape[1]
            col_e = jnp.zeros((1, zp), jnp.float32)
            col_ep = jnp.zeros((1, zp), jnp.float32)
            col_ea = jnp.zeros((1, zp), jnp.float32)
            for ro in range(0, gn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, gn - ro)
                lo = go + ro
                a = g_a2[lo:lo + rn, :]
                p = g_p2[lo:lo + rn, :]
                e = (jnp.exp(base + th[6] * a - p * t1)
                     * g_w2[lo:lo + rn, :])
                col_e = col_e + jnp.sum(e, axis=0, keepdims=True)
                col_ep = col_ep + jnp.sum(e * p, axis=0, keepdims=True)
                col_ea = col_ea + jnp.sum(e * a, axis=0, keepdims=True)
            s0 = jnp.sum(col_e)
            lnl = lnl - s0
            d[2] = d[2] - s0
            cez2 = jnp.sum(col_e * z2r)
            cez = jnp.sum(col_e * zr)
            d[0] = d[0] - cez2
            d[1] = d[1] - cez
            d[6] = d[6] - (jnp.sum(col_ea) - jnp.sum(lq * col_e))
            tp = t1 * col_ep
            d[3] = d[3] + th[6] * cez2 - jnp.sum(tp * z2r)
            d[4] = d[4] + th[6] * cez - jnp.sum(tp * zr)
            d[5] = d[5] + th[6] * s0 - jnp.sum(tp)
        sn = s_a.shape[0]
        for ro in range(0, sn, _CHUNK_ROWS):
            rn = min(_CHUNK_ROWS, sn - ro)
            m = s_mask[ro:ro + rn, :]
            z = s_z[ro:ro + rn, :]
            z2 = s_z2[ro:ro + rn, :]
            lq = th[3] * z2 + th[4] * z + th[5]
            x = jnp.minimum(s_a[ro:ro + rn, :] - lq, 60.0)
            ex = jnp.exp(x)
            contrib = (th[0] * z2 + th[1] * z + th[2] + th[6] * x - ex
                       + s_lnom0[ro:ro + rn, :])
            lnl = lnl + jnp.sum(jnp.where(m > 0.0, contrib, 0.0))
            r = th[6] - ex
            d[2] = d[2] + jnp.sum(m)
            d[0] = d[0] + jnp.sum(m * z2)
            d[1] = d[1] + jnp.sum(m * z)
            d[6] = d[6] + jnp.sum(m * x)
            mr = m * r
            d[3] = d[3] - jnp.sum(mr * z2)
            d[4] = d[4] - jnp.sum(mr * z)
            d[5] = d[5] - jnp.sum(mr)
        out_ref[i, 0] = lnl
        for j in range(7):
            out_ref[i, 1 + j] = d[j]


def _kernel_hier_vg(th_ref, g_a, g_p, g_w, out_ref, *, grid_rows):
    """Fused value + feature-gradient for the hierarchical lnlike.
    Features [aA, lnrest, (c_f, lA_f, t1_f) x F] (:func:`_feat_h_one`);
    output [lnlike, d_aA, d_lnrest, (d_c, d_lA, d_t1) x F]."""
    for i in range(th_ref.shape[0]):
        aA = th_ref[i, 0]
        lnl = th_ref[i, 1]
        d_aA = jnp.float32(0.0)
        for f, (go, gn) in enumerate(grid_rows):
            c = th_ref[i, 2 + 3 * f]
            lA = th_ref[i, 3 + 3 * f]
            t1 = th_ref[i, 4 + 3 * f]
            s0 = jnp.float32(0.0)
            s1 = jnp.float32(0.0)
            s2 = jnp.float32(0.0)
            for ro in range(0, gn, _CHUNK_ROWS):
                rn = min(_CHUNK_ROWS, gn - ro)
                lo = go + ro
                am = g_a[lo:lo + rn, :] - lA
                p = g_p[lo:lo + rn, :]
                e = jnp.exp(c + aA * am - p * t1) * g_w[lo:lo + rn, :]
                s0 = s0 + jnp.sum(e)
                s1 = s1 + jnp.sum(e * am)
                s2 = s2 + jnp.sum(e * p)
            lnl = lnl - s0
            d_aA = d_aA - s1
            out_ref[i, 3 + 3 * f] = -s0
            out_ref[i, 4 + 3 * f] = aA * s0
            out_ref[i, 5 + 3 * f] = s2
        out_ref[i, 0] = lnl
        out_ref[i, 1] = d_aA
        out_ref[i, 2] = jnp.float32(1.0)


def _kernel_fixed_vg(th_ref, g_a, g_p, g_w, out_ref):
    """Fused value + feature-gradient, fixed completeness. Features
    [c_grid, aA, lA, t1, lnpart] (:func:`_feat_fixed_one`); output
    [lnlike, d_c, d_aA, d_lA, d_t1, d_lnpart]."""
    nr = g_a.shape[0]
    for i in range(th_ref.shape[0]):
        c_g = th_ref[i, 0]
        aA = th_ref[i, 1]
        lA = th_ref[i, 2]
        t1 = th_ref[i, 3]
        s0 = jnp.float32(0.0)
        s1 = jnp.float32(0.0)
        s2 = jnp.float32(0.0)
        for ro in range(0, nr, _CHUNK_ROWS):
            rn = min(_CHUNK_ROWS, nr - ro)
            am = g_a[ro:ro + rn, :] - lA
            p = g_p[ro:ro + rn, :]
            e = jnp.exp(c_g + aA * am - p * t1) * g_w[ro:ro + rn, :]
            s0 = s0 + jnp.sum(e)
            s1 = s1 + jnp.sum(e * am)
            s2 = s2 + jnp.sum(e * p)
        out_ref[i, 0] = th_ref[i, 4] - s0
        out_ref[i, 1] = -s0
        out_ref[i, 2] = -s1
        out_ref[i, 3] = aA * s0
        out_ref[i, 4] = s2
        out_ref[i, 5] = jnp.float32(1.0)


# ---------------------------------------------------------------------------
# feature preparation (cheap XLA ops per batch)
# ---------------------------------------------------------------------------

def _feat_free_one(theta, layout, lref, fcmin):
    """(D,) reference theta -> (6+2F,) kernel features."""
    lstar, phistar, sch_al, logf50, alpha_c = layout.unpack(theta)
    log_ftau = logf50 + _log10_inverse_fleming_ratio(alpha_c, fcmin)
    return jnp.concatenate([
        jnp.stack([LN10 * phistar,
                   _LOG_LN10 + LN10 * phistar,
                   sch_al + 1.0,
                   LN10 * lstar,
                   10.0 ** (lref - lstar),
                   alpha_c]),
        logf50,
        10.0 ** (_LOGF_REF - log_ftau),
    ])


def _features_free(thetas, layout, lref, fcmin):
    """(W, D) reference thetas -> (W, 6+2F) kernel features (float32)."""
    return jax.vmap(lambda t: _feat_free_one(t, layout, lref, fcmin))(
        thetas.astype(jnp.float32))


def _feat_z_one(theta, layout):
    """(D,) z-model theta -> (7,) quadratic-coefficient features."""
    from lumfuncmcmc_tpu.ops.schechter import quad_coef

    L1, L2, L3, p1, p2, p3, al = layout.unpack(theta)
    ap, bp, cp = quad_coef(p1, p2, p3, layout.z1, layout.z2, layout.z3)
    aL, bL, cL = quad_coef(L1, L2, L3, layout.z1, layout.z2, layout.z3)
    return jnp.stack([LN10 * ap, LN10 * bp, LN10 * cp + _LOG_LN10,
                      LN10 * aL, LN10 * bL, LN10 * cL, al + 1.0])


def _features_z(thetas, layout):
    """(W, D) z-model thetas -> (W, 7) quadratic-coefficient features."""
    return jax.vmap(lambda t: _feat_z_one(t, layout))(
        thetas.astype(jnp.float32))


def _feat_fixed_one(theta, ctx, layout, lref):
    from lumfuncmcmc_tpu.models.likelihood import _ln_term_collapsed

    lstar, phistar, sch_al, _, _ = layout.unpack(theta)
    lnpart = _ln_term_collapsed(ctx, lstar, phistar, sch_al)
    return jnp.stack([LN10 * phistar, sch_al + 1.0, LN10 * lstar,
                      10.0 ** (lref - lstar), lnpart])


def _features_fixed(thetas, ctx, layout, lref):
    return jax.vmap(lambda t: _feat_fixed_one(t, ctx, layout, lref))(
        thetas.astype(jnp.float32))


# ---------------------------------------------------------------------------
# public builders
# ---------------------------------------------------------------------------

def _call_kernel(kern, feats, arrays, interpret, flat, blk=BLK_W):
    wk, nfeat = feats.shape
    const2 = lambda w: (0, 0)
    # broadcast kernels read theta as (blk, 1) vector columns and write a
    # vector output -> VMEM; slab kernels read per-walker scalars -> SMEM
    space = pltpu.VMEM if flat else pltpu.SMEM
    return pl.pallas_call(
        kern,
        grid=(wk // blk,),
        in_specs=[pl.BlockSpec((blk, nfeat), lambda w: (w, 0),
                               memory_space=space)]
        + [pl.BlockSpec(a.shape, const2, memory_space=pltpu.VMEM)
           for a in arrays],
        out_specs=pl.BlockSpec((blk, 1), lambda w: (w, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((wk, 1), jnp.float32),
        interpret=interpret,
    )(feats, *arrays)


def _make_stream_lnlike(ctx: LFContext, layout, interpret, blk):
    """Streaming free-completeness lnlike for over-VMEM catalogs (see
    :func:`_kernel_free_stream`)."""
    data = prepare_pallas_data(ctx, fix_comp=False, flat=False,
                               src_row_align=_SLAB_ROWS)
    fcmin = float(layout.fcmin) if layout.fcmin else 0.0
    n_slabs = data.s_a.shape[0] // _SLAB_ROWS
    slab_starts = tuple(off // _SLAB_ROWS for off, _ in data.src_rows)
    kern = partial(_kernel_free_stream, grid_rows=data.grid_rows,
                   slab_starts=slab_starts, nfields=data.nfields,
                   fcmin=fcmin)
    g_arrays = (data.g_logf, data.g_a, data.g_p, data.g_r, data.g_w)
    s_arrays = (data.s_logf, data.s_a, data.s_p, data.s_r,
                data.s_lnom0, data.s_mask)
    def batched(thetas):
        wk_in = thetas.shape[0]
        b = _choose_blk(wk_in, blk, flat=False)
        thetas = _pad_walkers(thetas, b)
        feats = _features_free(thetas, layout, data.lref,
                               fcmin).astype(jnp.float32)
        nfeat = feats.shape[1]
        out = pl.pallas_call(
            kern,
            grid=(thetas.shape[0] // b, n_slabs),
            in_specs=[pl.BlockSpec((b, nfeat), lambda i, j: (i, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM) for a in g_arrays]
            + [pl.BlockSpec((_SLAB_ROWS, LANES), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM) for a in s_arrays],
            out_specs=pl.BlockSpec((b, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((thetas.shape[0], 1),
                                           jnp.float32),
            interpret=interpret,
        )(feats, *g_arrays, *s_arrays)
        return out[:wk_in, 0]

    return batched


def make_pallas_lnlike(ctx: LFContext, layout, interpret: bool = False,
                       flat=None, blk=None):
    """Build a (W, D) -> (W,) batched single-epoch lnlike.

    Covers both completeness modes of the flagship model
    (``lumfuncmcmc.py:360-393``): free (kernel fuses Omega + Schechter +
    both reductions) and fixed (kernel computes the grid integral; the
    collapsed O(1) ln-term rides along as a feature). ``interpret=True``
    runs the Pallas interpreter — used by the CPU test suite.
    ``flat=None`` auto-selects the layout; True/False forces it.
    """
    fix_comp = bool(layout.fix_comp)
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    nsrc = int(np.asarray(ctx.lum).shape[0])
    n_g, n_s = (3, 0) if fix_comp else (5, 6)
    if (ncells * n_g + nsrc * n_s) * 4 > _VMEM_ARRAY_LIMIT:
        # the resident layouts keep all arrays in VMEM; past ~10 MB
        # that OOMs scoped vmem. Mega free-completeness catalogs keep
        # the grids resident and STREAM the source slabs from HBM
        # instead; if even the grid arrays overflow (or the ln-term is
        # already collapsed — fixed comp), signal the caller to use the
        # XLA path + source-axis mesh sharding (parallel/sharding.py).
        if fix_comp or ncells * n_g * 4 > _VMEM_ARRAY_LIMIT:
            return None
        return _make_stream_lnlike(ctx, layout, interpret, blk)
    if flat is None:
        # the (1, C) broadcast layout costs 8x VMEM (sublane padding);
        # use it whenever the resident arrays fit comfortably, else
        # per-walker slabs
        flat = (ncells * n_g + nsrc * n_s) * 4 * 8 < 11 * 2**20
    data = prepare_pallas_data(ctx, fix_comp, flat=flat)
    fcmin = float(layout.fcmin) if layout.fcmin else 0.0

    if fix_comp:
        kern = _kernel_fixed_bcast if flat else _kernel_fixed
        arrays = (data.g_a, data.g_p, data.g_w)
        max_chunk = data.g_a.shape[1] if flat else _CHUNK

        def feats_fn(thetas):
            return _features_fixed(thetas, ctx, layout, data.lref)
    else:
        kern = partial(_kernel_free_bcast if flat else _kernel_free,
                       grid_rows=data.grid_rows,
                       src_rows=data.src_rows, nfields=data.nfields,
                       fcmin=fcmin)
        arrays = (data.g_logf, data.g_a, data.g_p, data.g_r, data.g_w,
                  data.s_logf, data.s_a, data.s_p, data.s_r,
                  data.s_lnom0, data.s_mask)
        # widest single op chain: grid chunks + the unchunked source row
        max_chunk = (max([min(_CHUNK, n) for _, n in data.grid_rows]
                         + [n for _, n in data.src_rows])
                     if flat else _CHUNK)

        def feats_fn(thetas):
            return _features_free(thetas, layout, data.lref, fcmin)

    def batched(thetas):
        wk_in = thetas.shape[0]
        b = _choose_blk(wk_in, blk, flat, max_chunk)
        thetas = _pad_walkers(thetas, b)
        feats = feats_fn(thetas).astype(jnp.float32)
        out = _call_kernel(kern, feats, arrays, interpret, flat, blk=b)
        return out[:wk_in, 0]

    return batched


def make_pallas_lnlike_z(ctx: LFContext, layout, interpret: bool = False,
                         flat=None, blk=None):
    """(W, D) -> (W,) batched z-evolving lnlike (``lumfuncmcmc_z.py:
    364-376``); quadratic pivot coefficients are per-walker features.
    Small grids use the broadcast layout (two exps per element); big
    grids the 2-D slab layout with per-z-node hoisting (one exp per
    element). Returns None past the VMEM budget: unlike the free
    -completeness model, mega z catalogs are deliberately LEFT to XLA —
    the z source term is a (sources x z-features) @ (features x
    walkers) contraction that XLA lowers onto the MXU (measured
    2.15e11 source-evals/s at 10^6 sources, 2.1x a VPU streaming
    kernel; docs/PERFORMANCE.md), so a hand kernel can only lose."""
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    nsrc = int(np.asarray(ctx.lum).shape[0])
    if (ncells * 3 + nsrc * 5) * 4 > _VMEM_ARRAY_LIMIT:
        return None
    if flat is None:
        flat = (ncells * 4 + nsrc * 5) * 4 * 8 < 11 * 2**20
    if flat:
        data = prepare_pallas_z_data(ctx, flat=True)
        kern = _kernel_z_bcast
        arrays = (data.g_a, data.g_z, data.g_z2, data.g_w,
                  data.s_a, data.s_z, data.s_z2, data.s_lnom0,
                  data.s_mask)
        max_chunk = max(min(_CHUNK, data.g_a.shape[1]),
                        data.s_a.shape[1])
    else:
        d2 = prepare_pallas_z2_data(ctx)
        kern = partial(_kernel_z2_slab, grid_rows=d2.grid_rows,
                       lref_a=float(LN10 * d2.lref))
        arrays = (d2.g_a2, d2.g_p2, d2.g_w2, d2.zrow, d2.z2row,
                  d2.s_a, d2.s_z, d2.s_z2, d2.s_lnom0, d2.s_mask)
        max_chunk = _CHUNK

    def batched(thetas):
        wk_in = thetas.shape[0]
        b = _choose_blk(wk_in, blk, flat, max_chunk)
        thetas = _pad_walkers(thetas, b)
        feats = _features_z(thetas, layout).astype(jnp.float32)
        out = _call_kernel(kern, feats, arrays, interpret, flat, blk=b)
        return out[:wk_in, 0]

    return batched


def make_pallas_lnprob_z(ctx: LFContext, layout, interpret: bool = False,
                         flat=None, blk=None):
    """(W, D) -> (W,) z-model lnprob via the fused kernel; the strict
    -inequality pivot prior (``lumfuncmcmc_z.py:343-362``) masks
    outside the kernel.

    Falls back to the XLA path only for workloads whose arrays exceed
    the VMEM budget (mega source counts — shard those instead).
    """
    from lumfuncmcmc_tpu.models.likelihood_z import (
        lnprior_z, make_lnprob_z)

    lnlike = make_pallas_lnlike_z(ctx, layout, interpret=interpret,
                                  flat=flat, blk=blk)
    if lnlike is None:
        fallback = jax.vmap(make_lnprob_z(ctx, layout))
        fallback.engine = "xla-fallback"
        return fallback

    def batched(thetas):
        thetas = thetas.astype(jnp.float32)
        lp = jax.vmap(lambda t: lnprior_z(t, layout))(thetas)
        return jnp.where(jnp.isfinite(lp), lp + lnlike(thetas),
                         -jnp.inf)

    batched.engine = "pallas"
    return batched


def _feat_h_one(theta, ctx, layout, lref):
    from lumfuncmcmc_tpu.models.hierarchical import _ln_normal

    mu_l, sig_l, mu_p, sig_p, sch_al, lstar_f, phistar_f = \
        layout.unpack(theta)
    log_ln10 = jnp.log(jnp.asarray(LN10, theta.dtype))
    lnpart_f = (ctx.nsrc_f * (log_ln10 + LN10 * phistar_f)
                + LN10 * (sch_al + 1.0)
                * (ctx.sum_lum_f - ctx.nsrc_f * lstar_f)
                - jnp.exp(LN10 * (ctx.lref - lstar_f))
                * ctx.sum_pow_lum_f
                + ctx.sum_ln_om_f)
    hyper = (jnp.sum(_ln_normal(lstar_f, mu_l, sig_l))
             + jnp.sum(_ln_normal(phistar_f, mu_p, sig_p)))
    lnrest = jnp.sum(lnpart_f) + hyper
    per_field = jnp.stack([LN10 * phistar_f, LN10 * lstar_f,
                           10.0 ** (lref - lstar_f)],
                          axis=1).ravel()              # (3F,)
    return jnp.concatenate(
        [jnp.stack([sch_al + 1.0, lnrest]), per_field])


def _features_hier(thetas, ctx, layout, lref):
    return jax.vmap(lambda t: _feat_h_one(t, ctx, layout, lref))(
        thetas.astype(jnp.float32))


def make_pallas_lnprob_h(ctx: LFContext, layout, interpret: bool = False,
                         flat=None, blk=None):
    """(W, D) -> (W,) hierarchical-model lnprob via the fused kernel:
    the per-field grid integrals (the only O(grid) work,
    ``models/hierarchical.py::lnlike_h``) run in the kernel; the
    collapsed ln-terms and the population hyperprior ride along as a
    feature. Falls back to XLA past the VMEM budget."""
    from lumfuncmcmc_tpu.models.hierarchical import (
        lnprior_h, make_lnprob_h)

    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    if ncells * 3 * 4 > _VMEM_ARRAY_LIMIT:
        fallback = jax.vmap(make_lnprob_h(ctx, layout))
        fallback.engine = "xla-fallback"
        return fallback
    if flat is None:
        flat = ncells * 3 * 4 * 8 < 11 * 2**20
    data = prepare_pallas_data(ctx, fix_comp=True, flat=flat)
    kern = partial(_kernel_hier_bcast if flat else _kernel_hier_slab,
                   grid_rows=data.grid_rows)
    arrays = (data.g_a, data.g_p, data.g_w)
    max_chunk = (max(min(_CHUNK, n) for _, n in data.grid_rows)
                 if flat else _CHUNK)

    def batched(thetas):
        thetas = thetas.astype(jnp.float32)
        wk_in = thetas.shape[0]
        b = _choose_blk(wk_in, blk, flat, max_chunk)
        padded = _pad_walkers(thetas, b)
        feats = _features_hier(padded, ctx, layout,
                               data.lref).astype(jnp.float32)
        lnl = _call_kernel(kern, feats, arrays, interpret, flat,
                           blk=b)[:wk_in, 0]
        lp = jax.vmap(lambda t: lnprior_h(t, layout))(thetas)
        return jnp.where(jnp.isfinite(lp), lp + lnl, -jnp.inf)

    batched.engine = "pallas"
    return batched


def _vg_scalar_from_rows(vg_rows, feat_one, mask_fn):
    """custom_vjp plumbing shared by the gradient-path builders: the
    kernel emits [lnl, d lnl/d feats]; the fwd pass keeps the gradient
    columns as residuals so the bwd is one elementwise multiply."""
    @jax.custom_vjp
    def lnl_of_feats(feats):
        return vg_rows(feats)[:, 0]

    def _fwd(feats):
        out = vg_rows(feats)
        return out[:, 0], out[:, 1:]

    def _bwd(gfeats, ct):
        return (gfeats * ct[:, None],)

    lnl_of_feats.defvjp(_fwd, _bwd)

    def scalar_lnprob(theta):
        theta = theta.astype(jnp.float32)
        feats = feat_one(theta).astype(jnp.float32)
        lnl = lnl_of_feats(feats[None, :])[0]
        return mask_fn(theta, lnl)

    scalar_lnprob.engine = "pallas"
    return scalar_lnprob


def _build_vg_scalar(kern, arrays, feat_one, nfeat, interpret, mask_fn):
    """Resident-array vg builder: everything in VMEM, one grid step."""
    def vg_rows(feats):
        wk = feats.shape[0]
        const2 = lambda w: (0, 0)
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((wk, nfeat), const2,
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(a.shape, const2, memory_space=pltpu.VMEM)
               for a in arrays],
            out_specs=pl.BlockSpec((wk, 1 + nfeat), const2,
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((wk, 1 + nfeat), jnp.float32),
            interpret=interpret,
        )(feats, *arrays)

    return _vg_scalar_from_rows(vg_rows, feat_one, mask_fn)


def _make_stream_vg_scalar(ctx: LFContext, layout, interpret):
    """Streaming value+grad scalar for over-VMEM free-completeness
    catalogs (:func:`_kernel_free_stream_vg`): grids resident, source
    slabs streamed per inner grid step, SMEM output accumulated across
    the slab axis."""
    data = prepare_pallas_data(ctx, fix_comp=False, flat=False,
                               src_row_align=_SLAB_ROWS)
    fcmin = float(layout.fcmin) if layout.fcmin else 0.0
    n_slabs = data.s_a.shape[0] // _SLAB_ROWS
    slab_starts = tuple(off // _SLAB_ROWS for off, _ in data.src_rows)
    kern = partial(_kernel_free_stream_vg, grid_rows=data.grid_rows,
                   slab_starts=slab_starts, nfields=data.nfields,
                   fcmin=fcmin)
    g_arrays = (data.g_logf, data.g_a, data.g_p, data.g_r, data.g_w)
    s_arrays = (data.s_logf, data.s_a, data.s_p, data.s_r,
                data.s_lnom0, data.s_mask)
    nfeat = 6 + 2 * data.nfields

    def vg_rows(feats):
        wk = feats.shape[0]
        return pl.pallas_call(
            kern,
            grid=(1, n_slabs),
            in_specs=[pl.BlockSpec((wk, nfeat), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM) for a in g_arrays]
            + [pl.BlockSpec((_SLAB_ROWS, LANES), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM) for a in s_arrays],
            out_specs=pl.BlockSpec((wk, 1 + nfeat), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((wk, 1 + nfeat), jnp.float32),
            interpret=interpret,
        )(feats, *g_arrays, *s_arrays)

    def feat_one(theta):
        return _feat_free_one(_clamp_flim(theta, layout), layout,
                              data.lref, fcmin)

    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def mask_fn(theta, lnl):
        ok = jnp.all((theta >= lo) & (theta <= hi))
        return jnp.where(ok, lnl, -jnp.inf)

    return _vg_scalar_from_rows(vg_rows, feat_one, mask_fn)


def make_stream_shard_vg(ctx: LFContext, layout, nshards: int,
                         interpret: bool = False):
    """Per-shard streaming value+grad rows for the source-sharded
    mesh composition: the gradient-path twin of
    :func:`make_stream_shard_batched`, built on the SAME
    :func:`prepare_stream_shard_data` layout (quadrature weights
    pre-scaled ``1/nshards``, round-robin field-aligned source packs
    with a shared static row layout).

    Every output column — the lnlike AND each ``d lnl/d feature`` — is
    a sum of per-cell terms, so one ``psum`` of the full ``(wk,
    1+nfeat)`` row over the source mesh axis reconstructs the exact
    global value+gradient (grid terms appear once per shard at weight
    ``1/nshards``; source terms are disjoint). The caller wires that
    psum and the ``custom_vjp`` plumbing
    (``parallel/sharding.py::run_nuts_stream_sharded``).

    Returns ``(vg_rows(feats, s_local), s_stacked, feat_one)`` or
    ``None`` when the resident grids alone exceed the VMEM budget.
    """
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    if bool(layout.fix_comp) or ncells * 5 * 4 > _VMEM_ARRAY_LIMIT:
        return None
    gpack, grid_rows, s_stacked, src_rows, lref, nf = \
        prepare_stream_shard_data(ctx, nshards)
    fcmin = float(layout.fcmin) if layout.fcmin else 0.0
    sr = int(s_stacked["a"].shape[1])
    n_slabs = sr // _SLAB_ROWS
    slab_starts = tuple(off // _SLAB_ROWS for off, _ in src_rows)
    kern = partial(_kernel_free_stream_vg, grid_rows=grid_rows,
                   slab_starts=slab_starts, nfields=nf, fcmin=fcmin)
    g_arrays = (gpack["logf"], gpack["a"], gpack["p"], gpack["r"],
                gpack["w"])
    s_names = ("logf", "a", "p", "r", "lnom0", "mask")
    nfeat = 6 + 2 * nf

    def vg_rows(feats, s_local):
        wk = feats.shape[0]
        return pl.pallas_call(
            kern,
            grid=(1, n_slabs),
            in_specs=[pl.BlockSpec((wk, nfeat), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM) for a in g_arrays]
            + [pl.BlockSpec((_SLAB_ROWS, LANES), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM) for _ in s_names],
            out_specs=pl.BlockSpec((wk, 1 + nfeat), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((wk, 1 + nfeat), jnp.float32),
            interpret=interpret,
        )(feats, *g_arrays, *s_local)

    def feat_one(theta):
        return _feat_free_one(_clamp_flim(theta, layout), layout, lref,
                              fcmin)

    return vg_rows, tuple(s_stacked[nm] for nm in s_names), feat_one


def make_pallas_lnprob_and_grad(ctx: LFContext, layout,
                                interpret: bool = False,
                                model: str = "single"):
    """Scalar ``theta -> lnprob`` whose value AND vjp run one fused
    Pallas pass — the native tier's gradient path for NUTS (the
    reference has no gradients at all; ``jax.grad`` of the XLA path is
    the baseline here, ``samplers/nuts.py``).

    The kernel emits ``[lnlike, d lnlike/d features]`` per walker in a
    single sweep over the resident grids (``_kernel_*_vg``); a
    ``jax.custom_vjp`` hands the feature cotangent to XLA autodiff of
    the cheap feature map, so ``jax.value_and_grad`` (and NUTS's
    per-leapfrog calls) cost one kernel launch instead of XLA's forward
    + backward sweeps. The slab layout keeps full (8, 128) VPU rows per
    program even at batch 1, so the chain ``vmap`` in :func:`run_nuts`
    (which batches pallas_call by adding a grid dimension) loses no
    lane utilization.

    ``model`` selects the family: "single" (both completeness modes),
    "z" (quadratic pivot evolution), or "hier" (per-field Schechter
    with population hyperprior). Returns ``None`` past the VMEM gate
    (mega catalogs — shard those). Prior masking matches the
    corresponding forward lnprob builder.
    """
    ncells = int(np.prod(np.asarray(ctx.logL_grid).shape))
    nsrc = int(np.asarray(ctx.lum).shape[0])

    if model == "z":
        from lumfuncmcmc_tpu.models.likelihood_z import lnprior_z

        if (ncells * 3 + nsrc * 5) * 4 > _VMEM_ARRAY_LIMIT:
            return None
        d2 = prepare_pallas_z2_data(ctx)
        kern = partial(_kernel_z_vg, grid_rows=d2.grid_rows,
                       lref_a=float(LN10 * d2.lref))
        arrays = (d2.g_a2, d2.g_p2, d2.g_w2, d2.zrow, d2.z2row,
                  d2.s_a, d2.s_z, d2.s_z2, d2.s_lnom0, d2.s_mask)
        feat_one = lambda th: _feat_z_one(th, layout)
        nfeat = 7

        def mask_fn(theta, lnl):
            lp = lnprior_z(theta, layout)
            return jnp.where(jnp.isfinite(lp), lp + lnl, -jnp.inf)

        return _build_vg_scalar(kern, arrays, feat_one, nfeat,
                                interpret, mask_fn)

    if model == "hier":
        from lumfuncmcmc_tpu.models.hierarchical import lnprior_h

        if ncells * 3 * 4 > _VMEM_ARRAY_LIMIT:
            return None
        data = prepare_pallas_data(ctx, fix_comp=True, flat=False)
        kern = partial(_kernel_hier_vg, grid_rows=data.grid_rows)
        arrays = (data.g_a, data.g_p, data.g_w)
        feat_one = lambda th: _feat_h_one(th, ctx, layout, data.lref)
        nfeat = 2 + 3 * len(data.grid_rows)

        def mask_fn(theta, lnl):
            lp = lnprior_h(theta, layout)
            return jnp.where(jnp.isfinite(lp), lp + lnl, -jnp.inf)

        return _build_vg_scalar(kern, arrays, feat_one, nfeat,
                                interpret, mask_fn)

    fix_comp = bool(layout.fix_comp)
    n_g, n_s = (3, 0) if fix_comp else (5, 6)
    if (ncells * n_g + nsrc * n_s) * 4 > _VMEM_ARRAY_LIMIT:
        # mega catalogs: the fixed-comp ln-term is already collapsed
        # (nothing to stream), but free-completeness NUTS gets the
        # streaming value+grad kernel — the regime where the forward
        # comparison showed the HBM-streaming layout winning 4.1x
        # (docs/PERFORMANCE.md) previously fell back to XLA fwd+bwd
        if fix_comp or ncells * n_g * 4 > _VMEM_ARRAY_LIMIT:
            return None
        return _make_stream_vg_scalar(ctx, layout, interpret)
    data = prepare_pallas_data(ctx, fix_comp, flat=False)
    fcmin = float(layout.fcmin) if layout.fcmin else 0.0

    if fix_comp:
        kern = _kernel_fixed_vg
        arrays = (data.g_a, data.g_p, data.g_w)
        base_one = lambda th: _feat_fixed_one(th, ctx, layout, data.lref)
        nfeat = 5
    else:
        kern = partial(_kernel_free_vg, grid_rows=data.grid_rows,
                       src_rows=data.src_rows, nfields=data.nfields,
                       fcmin=fcmin)
        arrays = (data.g_logf, data.g_a, data.g_p, data.g_r, data.g_w,
                  data.s_logf, data.s_a, data.s_p, data.s_r,
                  data.s_lnom0, data.s_mask)
        base_one = lambda th: _feat_free_one(th, layout, data.lref,
                                             fcmin)
        nfeat = 6 + 2 * data.nfields

    def feat_one(theta):
        return base_one(_clamp_flim(theta, layout))

    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def mask_fn(theta, lnl):
        ok = jnp.all((theta >= lo) & (theta <= hi))
        return jnp.where(ok, lnl, -jnp.inf)

    return _build_vg_scalar(kern, arrays, feat_one, nfeat, interpret,
                            mask_fn)


def make_pallas_lnprob(ctx: LFContext, layout, interpret: bool = False,
                       blk=None):
    """(W, D) -> (W,) lnprob via the fused kernel, matching
    ``make_lnprob`` semantics for the single-epoch model (box-prior mask
    applied outside the kernel, as in ``lumfuncmcmc.py:395-424``).
    Falls back to the XLA path for workloads whose arrays exceed VMEM
    (mega-catalogs — shard those over the source mesh axis instead)."""
    lnlike = make_pallas_lnlike(ctx, layout, interpret=interpret, blk=blk)
    if lnlike is None:
        from lumfuncmcmc_tpu.models.likelihood import make_lnprob
        fallback = jax.vmap(make_lnprob(ctx, layout))
        fallback.engine = "xla-fallback"  # callers (bench) can detect
        return fallback
    lo = jnp.asarray(layout.lo, jnp.float32)
    hi = jnp.asarray(layout.hi, jnp.float32)

    def batched(thetas):
        thetas = thetas.astype(jnp.float32)
        lnl = lnlike(_clamp_flim(thetas, layout))
        ok = jnp.all((thetas >= lo) & (thetas <= hi), axis=1)
        return jnp.where(ok, lnl, -jnp.inf)

    batched.engine = "pallas"
    return batched
