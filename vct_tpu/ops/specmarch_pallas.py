"""Pallas per-pixel specular cone march, v2: class bricks + fused taps.

The production specular path.  The reference marches ONE narrow cone per
fragment along reflect(-E, N) with tanHalfAngle 0.07
(Shader/VoxelConeTracing.fs:217-223); the r3 fast path approximated it
with a 26-direction basis field whose mirror-cone error is basis-limited
(rel-RMS 0.63, FIDELITY_r03.json).  This kernel runs the exact per-pixel
march (core/march.py cone_march semantics: static step/lod schedule,
quadrilinear pyramid samples, front-to-back composite with the
alpha >= MAX_ALPHA early-out) on the radiance mip pyramid.

The r4 kernel's two structural limits, and what v2 does about them
(measured on the atrium fidelity G-buffer, /tmp spec diagnostics r5):

  1. FIDELITY — one brick per (256-pixel group, step group) capped the
     usable footprint at 6 x 6 x 14 cells; 22.7% of (tile, group)
     selections fell back to a coarser level than the schedule's
     (screen-wide kernel rel-RMS 0.49, VERDICT r4 weak #3).  v2 packs
     the pyramid with 2 y-shifted x 4 z-shifted page copies so brick
     origins are 8-granular in y AND z (the r4 layout lost 15 rows to
     16-alignment), and sizes bricks per GROUP CLASS: groups whose
     schedule level sits >= 3 levels above the coarsest get L bricks
     (32 x 24 x 32 cells -> footprint budget 28 x 15 x 23), the
     second-coarsest M (16 x 24 x 32 -> 14 x 15 x 23), the coarsest S
     (8 x 24 x 32 -> 6 x 15 x 23).  Measured fallback at these budgets:
     1.3-2.5% of steps (vs 22.7%), which the err ~ 1.1*sqrt(f) fit puts
     at the <= 0.15 kernel-rel-RMS north star.  L's x budget is capped
     at 28 (= 2 x (M budget)) so a fitting primary's ceil-half footprint
     always fits the M-class mip brick.
  2. LATENCY — the r4 kernel issued ~800 small ops per grid step
     (two-hot weight construction per (group, brick)); 94 us/step,
     766 ms per 1080p pass.  v2 computes ALL groups' step weights in one
     fused batch: the XLA prepass emits a per-tile row TABLE (level dim,
     brick origin, step distance, mip weight, AO attenuation per
     (role, group, step)); the kernel expands it to per-row values with
     two tiny selection matmuls, builds every row's two-hot x/y/z
     weights at the max extents once, runs one pair of expansion matmuls
     per contiguous class run, one brick matmul per (role, group), and
     composites all steps at once with a closed-form front-to-back
     reduction: wpx_k = T_{k-1} if T_{k-1} > 1 - MAX_ALPHA else 0 with
     T = cumprod(1 - alpha) (a log-depth tree), exactly the sequential
     thresholded recurrence (the product is non-increasing, so the
     first crossing freezes every later step's contribution at 0).

MOSAIC LAYOUT: the pyramid packs as ONE bf16 array (2, 4, XTP, Y0, ZC):
axis 0 = y-copy (volume y-shifted 0/8 rows -> 8-granular y origins on
16-aligned sublane slices), axis 1 = z-copy (z-shifted 0/8/16/24 cells
-> 8-granular z origins on 128-aligned lane slices), levels stacked
along x (level l starts at x = 2*D0 - 2*(D0 >> l); XTP adds BXL pad rows
so an L slice at the coarsest level stays in bounds — weights beyond a
level's extent are zero, so the over-read rows never contribute), every
level padded to Y0 = D0 + BY rows and ZC = max(D0, 32)*4 lanes (z fused
with the 4 rgba channels).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vct_tpu.core import march as M

Array = jax.Array

BY = 24           # brick y cells (all classes); page y pad rows
YGRAN = 16        # sublane slice alignment (bf16); y-copies give gran 8
ZGRAN = 8         # z-origin granularity via the 4 shifted z-copies
BZ = 32           # brick z cells = 128 lanes with the 4 channels
NC = 4            # rgba radiance channels
FLOOR_DIM = 8     # coarsest packed level
GWORDS = 4        # list words per (role, group) entry: lv, ox, oy, oz
NWORDS = 256      # int32 list row width (512^3 schedules reach ~33
                  # entries x 4 words; 128 was the r4 cap)
RTPAD = 96        # row-table entries per tile (padded); 8 f32 each —
                  # covers the 512^3 schedule's ~66 (role, step) blocks
RTCOLS = 8        # row-table columns: df, ox, oy, oz, dist, weight, atten
BXS = {"L": 32, "M": 16, "S": 8}          # class x extents
BUDGETS = {"L": (28, 15, 23), "M": (14, 15, 23), "S": (6, 15, 23)}
MIP_CLS = {"L": "M", "M": "M", "S": "S"}


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _level_dims(d0: int) -> Tuple[int, ...]:
    out = []
    d = d0
    while d >= FLOOR_DIM:
        out.append(d)
        d //= 2
    return tuple(out)


def _xbase(d0: int, lv: int) -> int:
    """Row where level lv starts in the x-concatenated page array."""
    return 2 * d0 - 2 * (d0 >> lv)


def _cls_of(l0g: int, nlev: int) -> str:
    """Brick class by distance from the coarsest level: the second-
    coarsest level's M brick nearly spans it, the coarsest's S spans it
    fully, everything finer gets L."""
    if l0g >= nlev - 1:
        return "S"
    if l0g == nlev - 2:
        return "M"
    return "L"


# ---------------------------------------------------------------------------
# packing + static planning
# ---------------------------------------------------------------------------

def pack_spec_mips(mips: Sequence[Array]) -> Array:
    """Isotropic radiance mips (D,D,D,4) f32 -> ONE (2, 4, XTP, Y0, ZC)
    bf16 array (see module header).  Packs levels down to FLOOR_DIM."""
    d0 = mips[0].shape[0]
    dims = _level_dims(d0)
    y0 = d0 + BY
    zc = max(d0, BZ)
    copies = []
    for ya in (0, 8):
        zrow = []
        for zi in range(4):
            zb = 8 * zi
            parts = []
            for li, d in enumerate(dims):
                m = mips[li]
                assert m.shape[0] == d, (m.shape, dims)
                c = m[:, min(ya, d):, min(zb, d):]
                # bf16 BEFORE the big concats: the 8-copy f32
                # intermediate would transiently double HBM (~5 GB at
                # 256^3) and OOM alongside a live voxel state
                parts.append(jnp.pad(
                    c, ((0, 0), (0, y0 - c.shape[1]),
                        (0, zc - c.shape[2]), (0, 0))
                ).astype(jnp.bfloat16))
            parts.append(jnp.zeros((BXS["L"], y0, zc, NC), jnp.bfloat16))
            zrow.append(jnp.concatenate(parts, axis=0))
        copies.append(jnp.stack(zrow, axis=0))
    packed = jnp.stack(copies, axis=0)        # (2, 4, XTP, Y0, ZC, 4)
    xtp = packed.shape[2]
    return packed.reshape(2, 4, xtp, y0, zc * NC)


def pages_dims(pages: Array) -> Tuple[int, ...]:
    """Recover the packed level dims from the page array shape."""
    d0 = pages.shape[3] - BY
    dims = _level_dims(d0)
    assert pages.shape[2] == sum(dims) + BXS["L"], (pages.shape, dims)
    return dims


@functools.lru_cache(maxsize=None)
def plan_groups(schedule: M.MarchSchedule, num_levels: int,
                span_cells: float = 4.0, max_group: int = 4):
    """Static step grouping: runs of equal floor(lod) (clamped into the
    packed stack) whose along-ray span stays within span_cells of the
    group's mip cell size.  Returns a tuple of groups, each
    (l0, ((dist, mip_w, diameter), ...))."""
    plan = M._static_lod_plan(schedule.lods, num_levels)
    groups = []
    cur_l0, cur_steps, start_d = None, [], 0.0
    for k, (l0, l1, w) in enumerate(plan):
        dist = schedule.dists[k]
        cell = schedule.voxel_world_size * (2.0 ** l0)
        if (cur_l0 != l0 or len(cur_steps) >= max_group
                or (dist - start_d) > span_cells * cell):
            if cur_steps:
                groups.append((cur_l0, tuple(cur_steps)))
            cur_l0, cur_steps, start_d = l0, [], dist
        cur_steps.append((dist, w if l1 != l0 else 0.0,
                          schedule.diameters[k]))
    if cur_steps:
        groups.append((cur_l0, tuple(cur_steps)))
    return tuple(groups)


@dataclasses.dataclass(frozen=True)
class EntryPlan:
    """Static (role, group) entry layout shared by the prepass, the
    kernel, and the jnp mirror.

    Entries are ordered primaries (every group, schedule order) then
    mips (groups >= g_mip).  Because plan_groups' schedule levels are
    non-decreasing and the class map is monotone in level, both role
    blocks are class-contiguous — `runs` lists the maximal contiguous
    (class, first_entry, last_entry+1) spans for the fused expansion
    matmuls."""

    entries: Tuple[Tuple[str, int, str], ...]   # (role, group, class)
    g_mip: int                                  # first group with mip
    m0: int                                     # first mip step index
    nsteps: int                                 # schedule steps
    blocks: Tuple[int, ...]                     # row-blocks per entry
    block_off: Tuple[int, ...]                  # block offset per entry
    runs: Tuple[Tuple[str, int, int], ...]      # (cls, entry a, entry b)
    slots: Tuple[int, ...]                      # per-entry class slot
    class_counts: Dict[str, int]


@functools.lru_cache(maxsize=None)
def plan_entries(groups, num_levels: int) -> EntryPlan:
    nlev = num_levels
    g_mip = next((g for g, (_, steps) in enumerate(groups)
                  if any(s[1] > 0.0 for s in steps)), len(groups))
    entries: List[Tuple[str, int, str]] = []
    for g, (l0g, _) in enumerate(groups):
        entries.append(("prim", g, _cls_of(l0g, nlev)))
    for g, (l0g, _) in enumerate(groups):
        if g >= g_mip:
            entries.append(("mip", g, MIP_CLS[_cls_of(l0g, nlev)]))
    blocks, off, block_off = [], 0, []
    for role, g, _ in entries:
        block_off.append(off)
        blocks.append(len(groups[g][1]))
        off += len(groups[g][1])
    assert off <= RTPAD, (off, RTPAD)
    assert GWORDS * len(entries) <= NWORDS, len(entries)
    runs, slots = [], []
    counts: Dict[str, int] = {}
    for e, (_, _, cls) in enumerate(entries):
        if runs and runs[-1][0] == cls and runs[-1][2] == e:
            runs[-1] = (cls, runs[-1][1], e + 1)
        else:
            runs.append((cls, e, e + 1))
        slots.append(counts.get(cls, 0))
        counts[cls] = counts.get(cls, 0) + 1
    nsteps = sum(len(s) for _, s in groups)
    m0 = sum(len(groups[g][1]) for g in range(g_mip))
    return EntryPlan(entries=tuple(entries), g_mip=g_mip, m0=m0,
                     nsteps=nsteps, blocks=tuple(blocks),
                     block_off=tuple(block_off), runs=tuple(runs),
                     slots=tuple(slots), class_counts=counts)


# ---------------------------------------------------------------------------
# XLA prepass: per-(tile, entry) level + brick origin + row table
# ---------------------------------------------------------------------------

def _origins(lo: Array, d: int, bx: int) -> Array:
    ox = jnp.clip(lo[:, 0], 0, max(d - bx, 0))
    oy = jnp.clip(8.0 * jnp.floor(lo[:, 1] / 8.0), 0, max(d - 1, 0))
    oz = jnp.clip(8.0 * jnp.floor(lo[:, 2] / 8.0), 0, max(d, BZ) - BZ)
    return jnp.stack([ox, oy, oz], axis=1).astype(jnp.int32)


def select_spec_bricks(start: Array,        # (ntiles, tile, 3) world
                       refl: Array,         # (ntiles, tile, 3) unit
                       valid: Array,        # (ntiles, tile) bool
                       groups,              # plan_groups output
                       dims: Sequence[int],  # packed level dims
                       world_size: float,
                       occlusion_falloff: float = 0.03,
                       ) -> Tuple[Array, Array]:
    """Per-tile brick lists + row table.

    Returns (lists (ceil8(ntiles), NWORDS) int32,
             rowtab (ceil8(ntiles), RTPAD*RTCOLS) f32).
    lists: per entry e, words [4e..4e+3] = (packed level, origin x, y, z)
    with y/z origins 8-granular (the shifted page copies).  rowtab: per
    (entry, step) row-block, RTCOLS floats [level dim, origin x, y, z,
    step distance, composite weight, AO attenuation, 0]; the weight is
    (1 - w_mip) for primary rows and w_mip for mip rows, with w_mip the
    schedule's quadrilinear lerp weight zeroed when the tile's selected
    level fell back below the schedule level (spec_march_ref semantics).
    """
    ntiles = start.shape[0]
    big = jnp.float32(3e38)
    vm = valid[..., None]
    nlev = len(dims)
    plan = plan_entries(tuple(groups), nlev)

    s_lo = jnp.min(jnp.where(vm, start, big), axis=1)       # (ntiles, 3)
    s_hi = jnp.max(jnp.where(vm, start, -big), axis=1)
    r_lo = jnp.min(jnp.where(vm, refl, big), axis=1)
    r_hi = jnp.max(jnp.where(vm, refl, -big), axis=1)
    any_valid = jnp.any(valid, axis=1)

    # per-group interval AABBs -> level + origins at primary budgets;
    # the mip entry reuses the group's AABB at level+1 with its class
    per_group = []
    for g, (l0g, steps) in enumerate(groups):
        cls = _cls_of(l0g, nlev)
        xb, yb, zb = BUDGETS[cls]
        bx = BXS[cls]
        da, db = steps[0][0], steps[-1][0]
        p_lo = s_lo + jnp.minimum(da * r_lo, db * r_lo)
        p_hi = s_hi + jnp.maximum(da * r_hi, db * r_hi)
        umin = jnp.clip(p_lo / (world_size * 0.5) * 0.5 + 0.5, -1e30, 1e30)
        umax = jnp.clip(p_hi / (world_size * 0.5) * 0.5 + 0.5, -1e30, 1e30)

        fits, origins = [], []
        for lv in range(l0g, nlev):
            d = dims[lv]
            lo = jnp.floor(jnp.clip(umin * d - 0.5, 0.0, d - 1.0))
            hi = jnp.floor(jnp.clip(umax * d - 0.5, 0.0, d - 1.0))
            ok = ((hi[:, 0] - lo[:, 0] <= xb)
                  & (hi[:, 1] - lo[:, 1] <= yb)
                  & (hi[:, 2] - lo[:, 2] <= zb))
            fits.append(ok)
            origins.append(_origins(lo, d, bx))
        fits = jnp.stack(fits, axis=1)
        fits = fits.at[:, -1].set(True)        # coarsest always fits
        rel = jnp.argmax(fits, axis=1).astype(jnp.int32)
        level = jnp.where(any_valid, rel + l0g, nlev - 1)
        org = jnp.take_along_axis(
            jnp.stack(origins, axis=1), rel[:, None, None], axis=1)[:, 0]
        org = jnp.where(any_valid[:, None], org, 0)

        # mip origins at min(level+1, last), with the mip class extent
        bx1 = BXS[MIP_CLS[cls]]
        orgs1 = []
        for lv in range(l0g, nlev):
            d1 = dims[min(lv + 1, nlev - 1)]
            lo1 = jnp.floor(jnp.clip(umin * d1 - 0.5, 0.0, d1 - 1.0))
            orgs1.append(_origins(lo1, d1, bx1))
        org1 = jnp.take_along_axis(
            jnp.stack(orgs1, axis=1), rel[:, None, None], axis=1)[:, 0]
        org1 = jnp.where(any_valid[:, None], org1, 0)
        level1 = jnp.minimum(level + 1, nlev - 1)
        per_group.append((level, org, level1, org1))

    # lists: entry-major words
    words = []
    for role, g, _ in plan.entries:
        level, org, level1, org1 = per_group[g]
        if role == "prim":
            words.append(jnp.concatenate([level[:, None], org], axis=1))
        else:
            words.append(jnp.concatenate([level1[:, None], org1], axis=1))
    lists = jnp.zeros((ntiles, NWORDS), jnp.int32)
    lists = lists.at[:, :GWORDS * len(plan.entries)].set(
        jnp.concatenate(words, axis=1))

    # rowtab: per (entry, step) RTCOLS floats
    dims_f = np.asarray(dims, np.float32)
    cols = []
    for e, (role, g, _) in enumerate(plan.entries):
        l0g, steps = groups[g]
        level, org, level1, org1 = per_group[g]
        lv = level if role == "prim" else level1
        o = (org if role == "prim" else org1).astype(jnp.float32)
        df = jnp.asarray(dims_f)[lv][:, None]                # (ntiles, 1)
        exact = (level == l0g).astype(jnp.float32)[:, None]
        for dist, w, diam in steps:
            w_eff = w * exact                                # (ntiles, 1)
            wgt = (1.0 - w_eff) if role == "prim" else w_eff
            att = 1.0 / (1.0 + occlusion_falloff * diam)
            cols.append(jnp.concatenate([
                df, o,
                jnp.full((ntiles, 1), dist, jnp.float32),
                wgt,
                jnp.full((ntiles, 1), att, jnp.float32),
                jnp.zeros((ntiles, 1), jnp.float32)], axis=1))
    rowtab = jnp.zeros((ntiles, RTPAD * RTCOLS), jnp.float32)
    rowtab = rowtab.at[:, :len(cols) * RTCOLS].set(
        jnp.concatenate(cols, axis=1))

    pad = (-ntiles) % 8
    if pad:
        lists = jnp.concatenate(
            [lists, jnp.zeros((pad, NWORDS), jnp.int32)], axis=0)
        rowtab = jnp.concatenate(
            [rowtab, jnp.zeros((pad, RTPAD * RTCOLS), jnp.float32)],
            axis=0)
    return lists, rowtab


# ---------------------------------------------------------------------------
# static expansion matrices
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _expansions(bx: int) -> Tuple[np.ndarray, np.ndarray]:
    """x/y cell -> (x, y) flat-cell 0/1 expansions for a (bx, BY) brick."""
    j = np.arange(bx * BY)
    ex = (j[None, :] // BY == np.arange(bx)[:, None]).astype(np.float32)
    ey = (j[None, :] % BY == np.arange(BY)[:, None]).astype(np.float32)
    return ex, ey


@functools.lru_cache(maxsize=None)
def _zc_expansions() -> Tuple[np.ndarray, np.ndarray]:
    l = np.arange(BZ * NC)
    ez = (l[None, :] // NC == np.arange(BZ)[:, None]).astype(np.float32)
    fc = (l[:, None] % NC == np.arange(NC)[None, :]).astype(np.float32)
    return ez, fc


@functools.lru_cache(maxsize=None)
def _row_select(nblocks_rows: int, tile: int):
    """Selection matrices expanding the tile's flat row-table into
    per-row values: tmp = (P * flat) @ S unpacks the (1, RTPAD*RTCOLS)
    row into (RTPAD, RTCOLS); rowvals = E @ tmp repeats block j's entry
    over its `tile` rows."""
    p = (np.arange(RTPAD * RTCOLS)[None, :] // RTCOLS
         == np.arange(RTPAD)[:, None]).astype(np.float32)
    s = (np.arange(RTPAD * RTCOLS)[:, None] % RTCOLS
         == np.arange(RTCOLS)[None, :]).astype(np.float32)
    e = (np.arange(nblocks_rows * tile)[:, None] // tile
         == np.arange(RTPAD)[None, :]).astype(np.float32)
    return p, s, e


def _twohot(t: Array, extent: int) -> Array:
    """(n, 1) local cell coords -> (n, extent) f32 lerp weights."""
    n = t.shape[0]
    i0 = jnp.clip(jnp.floor(t), 0.0, float(extent - 2))
    f = jnp.clip(t - i0, 0.0, 1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, extent), 1)
    ii = i0.astype(jnp.int32)
    return (jnp.where(cols == ii, 1.0 - f, 0.0)
            + jnp.where(cols == ii + 1, f, 0.0))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _spec_kernel(start_ref, refl_ref,       # (tile, 4) f32
                 p_ref, s_ref, e_ref,       # row-select matrices
                 ez_ref, fc_ref,            # z expansion / channel fold
                 *rest,
                 plan: EntryPlan, dims: Tuple[int, ...],
                 world_size: float, max_alpha: float, tile: int,
                 classes: Tuple[str, ...]):
    ncls = len(classes)
    exy_refs = rest[:2 * ncls]              # exC, eyC per class
    lists_ref, rowtab_ref, pages_ref, out_ref, listbuf, rowbuf = \
        rest[2 * ncls:2 * ncls + 6]
    bricks = rest[2 * ncls + 6:2 * ncls + 6 + ncls]
    sems = rest[2 * ncls + 6 + ncls:2 * ncls + 6 + 2 * ncls]
    lsem, rsem = rest[2 * ncls + 6 + 2 * ncls:]
    cls_ix = {c: i for i, c in enumerate(classes)}
    nl = len(dims)
    d0 = dims[0]
    ne = len(plan.entries)

    i = pl.program_id(0)
    grp = pl.multiple_of(8 * (i // 8), 8)
    pltpu.make_async_copy(lists_ref.at[pl.ds(grp, 8)], listbuf,
                          lsem).start()
    pltpu.make_async_copy(rowtab_ref.at[pl.ds(grp, 8)], rowbuf,
                          rsem).start()
    pltpu.make_async_copy(lists_ref.at[pl.ds(grp, 8)], listbuf,
                          lsem).wait()
    r0 = i % 8

    # issue every entry's brick DMA (addresses are pure arithmetic on the
    # listbuf scalars; the shifted copies make y/z origins 8-granular)
    for e, (_, _, cls) in enumerate(plan.entries):
        bx = BXS[cls]
        lv = listbuf[r0, GWORDS * e]
        ox = listbuf[r0, GWORDS * e + 1]
        oy = listbuf[r0, GWORDS * e + 2]
        oz = listbuf[r0, GWORDS * e + 3]
        xb = (2 * d0 - 2 * jax.lax.shift_right_logical(jnp.int32(d0), lv)
              + ox)
        ycp = jax.lax.shift_right_logical(oy, 3) & 1
        yrow = oy - 8 * ycp
        zcp = jax.lax.shift_right_logical(oz, 3) & 3
        lane = (oz - 8 * zcp) * NC
        ci = cls_ix[cls]
        pltpu.make_async_copy(
            pages_ref.at[ycp, zcp, pl.ds(xb, bx),
                         pl.ds(pl.multiple_of(yrow, YGRAN), BY),
                         pl.ds(pl.multiple_of(lane, BZ * NC), BZ * NC)],
            bricks[ci].at[plan.slots[e]], sems[ci].at[plan.slots[e]]
        ).start()

    # ---- phase A: fused per-row values + two-hot weights ----
    pltpu.make_async_copy(rowtab_ref.at[pl.ds(grp, 8)], rowbuf,
                          rsem).wait()
    flat = rowbuf[pl.ds(r0, 1), :]                    # (1, RTPAD*RTCOLS)
    hi = jax.lax.Precision.HIGHEST
    tmp = jax.lax.dot_general(
        p_ref[...] * flat, s_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)  # (RTPAD, 8)
    rowvals = jax.lax.dot_general(
        e_ref[...], tmp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)  # (R, 8)

    nb = sum(plan.blocks)                              # row blocks
    r_all = nb * tile
    start4 = start_ref[...]
    pos = start4[:, 0:3]
    refl = refl_ref[...][:, 0:3]
    pos_rep = jnp.broadcast_to(pos[None], (nb, tile, 3)).reshape(r_all, 3)
    refl_rep = jnp.broadcast_to(refl[None], (nb, tile, 3)).reshape(
        r_all, 3)
    dist = rowvals[:, 4:5]
    df = rowvals[:, 0:1]
    pk = pos_rep + dist * refl_rep
    uvw = pk / (world_size * 0.5) * 0.5 + 0.5
    tt = jnp.minimum(jnp.maximum(uvw * df - 0.5, 0.0), df - 1.0)
    wx = _twohot(tt[:, 0:1] - rowvals[:, 1:2], BXS["L"])   # (R, 32)
    wy = _twohot(tt[:, 1:2] - rowvals[:, 2:3], BY)         # (R, 24)
    wz = _twohot(tt[:, 2:3] - rowvals[:, 3:4], BZ)         # (R, 32)
    wzc = jax.lax.dot_general(
        wz.astype(jnp.bfloat16), ez_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # ---- phase B: per-run expansion + per-entry brick matmuls ----
    for e, (_, _, cls) in enumerate(plan.entries):
        ci = cls_ix[cls]
        pltpu.make_async_copy(bricks[ci].at[plan.slots[e]],
                              bricks[ci].at[plan.slots[e]],
                              sems[ci].at[plan.slots[e]]).wait()
    txy_parts = []
    for cls, ea, eb in plan.runs:
        bx = BXS[cls]
        ci = cls_ix[cls]
        a = plan.block_off[ea] * tile
        b = (plan.block_off[eb - 1] + plan.blocks[eb - 1]) * tile
        exw = jax.lax.dot_general(
            wx[a:b, :bx].astype(jnp.bfloat16),
            exy_refs[2 * ci][...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        eyw = jax.lax.dot_general(
            wy[a:b].astype(jnp.bfloat16),
            exy_refs[2 * ci + 1][...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        exy = exw * eyw                                    # (rows, bx*BY)
        for e in range(ea, eb):
            la = (plan.block_off[e] - plan.block_off[ea]) * tile
            lb = la + plan.blocks[e] * tile
            txy_parts.append(jax.lax.dot_general(
                exy[la:lb],
                bricks[ci][plan.slots[e]].reshape(bx * BY, BZ * NC),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    txy = jnp.concatenate(txy_parts, axis=0)               # (R, 128)
    smp = jax.lax.dot_general(
        txy * wzc, fc_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (R, 4)

    # ---- phase C: mip merge + closed-form front-to-back composite ----
    # Reshapes only SPLIT the leading (sublane-major) dim, keeping the
    # small lane dims (4 / 1) intact — lane-dim reshapes relayout.
    smp_w = smp * rowvals[:, 5:6]
    r1 = plan.nsteps * tile
    mrow = plan.m0 * tile
    merged = jnp.concatenate(
        [smp_w[:mrow], smp_w[mrow:r1] + smp_w[r1:]], axis=0)
    s3 = merged.reshape(plan.nsteps, tile, 4)
    al = s3[..., 3:4]                                      # (K, tile, 1)
    att = rowvals[:r1, 6:7].reshape(plan.nsteps, tile, 1)
    one_m = 1.0 - al
    # log-depth inclusive cumprod over the step axis: the sequential
    # thresholded recurrence reduces to wpx_k = T_{k-1} gated on the
    # first MAX_ALPHA crossing because the product is non-increasing
    cum = one_m
    off = 1
    while off < plan.nsteps:
        cum = cum * jnp.concatenate(
            [jnp.ones((off, tile, 1), jnp.float32), cum[:-off]], axis=0)
        off *= 2
    t0r = start4[:, 3:4]                                   # (tile, 1)
    tprev = jnp.concatenate(
        [jnp.ones((1, tile, 1), jnp.float32), cum[:-1]],
        axis=0) * t0r[None]
    wpx = jnp.where(tprev > 1.0 - max_alpha, tprev, 0.0)
    color = jnp.sum(wpx * s3[..., 0:3], axis=0)            # (tile, 3)
    occ = jnp.sum(wpx * al * att, axis=0)                  # (tile, 1)
    out_ref[...] = jnp.concatenate([color, occ], axis=1)


def _spec_pallas(start4, refl4, lists, rowtab, pages, statics) -> Array:
    (groups, dims, world_size, max_alpha, occlusion_falloff, interpret,
     tile) = statics
    n = start4.shape[0]
    ntiles = n // tile
    assert n % tile == 0, (n, tile)
    assert lists.shape[0] >= _ceil_to(ntiles, 8) \
        and lists.shape[1] == NWORDS, (lists.shape, ntiles)
    assert rowtab.shape[0] >= _ceil_to(ntiles, 8) \
        and rowtab.shape[1] == RTPAD * RTCOLS, (rowtab.shape, ntiles)
    plan = plan_entries(tuple(groups), len(dims))
    classes = tuple(sorted(plan.class_counts, key="LMS".index))
    nb = sum(plan.blocks)
    p_m, s_m, e_m = _row_select(nb, tile)
    ez, fc = _zc_expansions()
    kern = functools.partial(
        _spec_kernel, plan=plan, dims=tuple(dims),
        world_size=world_size, max_alpha=max_alpha, tile=tile,
        classes=classes)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        whole(p_m.shape), whole(s_m.shape), whole(e_m.shape),
        whole(ez.shape), whole(fc.shape),
    ]
    args = [start4, refl4, jnp.asarray(p_m), jnp.asarray(s_m),
            jnp.asarray(e_m), jnp.asarray(ez), jnp.asarray(fc)]
    for cls in classes:
        exc, eyc = _expansions(BXS[cls])
        in_specs += [whole(exc.shape), whole(eyc.shape)]
        args += [jnp.asarray(exc), jnp.asarray(eyc)]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),    # lists
                 pl.BlockSpec(memory_space=pl.ANY),    # rowtab
                 pl.BlockSpec(memory_space=pl.ANY)]    # pages
    args += [lists, rowtab, pages]

    scratch = [
        pltpu.SMEM((8, NWORDS), jnp.int32),
        pltpu.VMEM((8, RTPAD * RTCOLS), jnp.float32),
    ]
    for cls in classes:
        scratch.append(pltpu.VMEM(
            (plan.class_counts[cls], BXS[cls], BY, BZ * NC),
            jnp.bfloat16))
    for cls in classes:
        scratch.append(pltpu.SemaphoreType.DMA((plan.class_counts[cls],)))
    scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, NC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# jnp reference (oracle + VJP linearization point)
# ---------------------------------------------------------------------------

def spec_march_ref(start4: Array, refl4: Array, lists: Array,
                   pages: Array, groups, dims: Sequence[int],
                   world_size: float, max_alpha: float,
                   occlusion_falloff: float, tile: int = 256) -> Array:
    """Pure-jnp mirror honoring the per-tile forced levels in `lists`:
    per step, trilinear samples of the packed pages (copy 0, 0) at the
    listed level pair, mip-lerped only when the listed level equals the
    schedule's, composited exactly like core/march.composite's
    sequential form.  Differentiable to the pages and ray inputs."""
    from vct_tpu.core import grid as G

    n = start4.shape[0]
    ntiles = n // tile
    pos = start4[:, 0:3]
    t = start4[:, 3:4]
    refl = refl4[:, 0:3]
    pix = jnp.repeat(jnp.arange(ntiles), tile)
    nl = len(dims)
    d0 = dims[0]
    plan = plan_entries(tuple(groups), nl)

    def sample_level(p, lv_pix):
        out = jnp.zeros((n, NC), jnp.float32)
        uvw = G.world_to_uvw(p, world_size)
        for li, d in enumerate(dims):
            xb = _xbase(d0, li)
            vol = pages[0, 0, xb:xb + d, :d, :d * NC].astype(
                jnp.float32).reshape(d, d, d, NC)
            sv = G.trilinear_sample(vol, uvw)
            out = jnp.where((lv_pix == li)[:, None], sv, out)
        return out

    color = jnp.zeros((n, 3), jnp.float32)
    occ = jnp.zeros((n, 1), jnp.float32)
    for g, (l0g, steps) in enumerate(groups):
        lv = lists[:ntiles, GWORDS * g][pix]          # primary entry g
        lv1 = jnp.minimum(lv + 1, nl - 1)
        exact = (lv == l0g).astype(jnp.float32)[:, None]
        for dist, mip_w, diam in steps:
            p = pos + dist * refl
            smp = sample_level(p, lv)
            if mip_w > 0.0 and g >= plan.g_mip:
                smp1 = sample_level(p, lv1)
                w_eff = mip_w * exact
                smp = smp * (1.0 - w_eff) + smp1 * w_eff
            al = smp[:, 3:4]
            active = (1.0 - t) < max_alpha
            wpx = jnp.where(active, t, 0.0)
            color = color + wpx * smp[:, 0:3]
            occ = occ + wpx * al / (1.0 + occlusion_falloff * diam)
            t = jnp.where(active, t * (1.0 - al), t)
    return jnp.concatenate([color, occ], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spec_call(statics, start4, refl4, lists, rowtab, pages):
    return _spec_pallas(start4, refl4, lists, rowtab, pages, statics)


def _spec_fwd(statics, start4, refl4, lists, rowtab, pages):
    out = _spec_call(statics, start4, refl4, lists, rowtab, pages)
    return out, (start4, refl4, lists, rowtab, pages)


def _spec_bwd(statics, res, bar):
    (groups, dims, world_size, max_alpha, occlusion_falloff, _interp,
     tile) = statics
    start4, refl4, lists, rowtab, pages = res

    def ref(s4, r4, pg):
        return spec_march_ref(s4, r4, lists, pg, groups, dims, world_size,
                              max_alpha, occlusion_falloff, tile)

    _, vjp = jax.vjp(ref, start4, refl4, pages)
    ds4, dr4, dpages = vjp(bar)
    zlists = np.zeros(lists.shape, jax.dtypes.float0)
    zrowtab = jnp.zeros_like(rowtab)
    return ds4, dr4, zlists, zrowtab, dpages


_spec_call.defvjp(_spec_fwd, _spec_bwd)


@functools.partial(
    jax.jit, static_argnames=("groups", "dims", "world_size", "max_alpha",
                              "occlusion_falloff", "interpret", "tile"))
def spec_march_tiles(start4: Array,          # (n, 4): start xyz, hit mask
                     refl4: Array,           # (n, 4): reflection xyz
                     lists: Array,           # select_spec_bricks lists
                     rowtab: Array,          # select_spec_bricks rowtab
                     pages: Array,           # pack_spec_mips output
                     *, groups, dims: Tuple[int, ...], world_size: float,
                     max_alpha: float, occlusion_falloff: float,
                     interpret: bool = False, tile: int = 256) -> Array:
    """Per-pixel specular cone march -> (n, 4) f32 [rgb, occlusion].

    start4 = surface point + the normal offset (fs:92) with the hit mask
    in w (miss pixels march with zero transmittance — zero output).
    pages from pack_spec_mips(radiance_mips); (lists, rowtab) from
    select_spec_bricks.  Oracle: core/march.cone_march up to the
    per-tile footprint-forced lod fallback; differentiable via
    spec_march_ref.
    """
    statics = (tuple(groups), tuple(dims), float(world_size),
               float(max_alpha), float(occlusion_falloff), bool(interpret),
               int(tile))
    return _spec_call(statics, start4, refl4, lists, rowtab, pages)
