"""Brick-sharded (tensor-parallel) dense cone marching — 512^3+ grids.

SURVEY.md §2.4 "TP" row: shard the voxel pyramid's finest levels along one
spatial axis across the 'model' mesh axis; coarse mips replicate; cone
samples crossing brick boundaries resolve via HALO EXCHANGE — the
ring-attention-shaped piece of this framework (§5 "long-context" row).

How it maps onto the direction-major dense march (core/dense.py): every
march step resamples a mip level at a constant world shift, separably per
axis.  Shard field AND fine levels along x.  The y/z resamples stay
shard-local; the x resample of step k needs level rows
[x_lo - shift_k, x_hi + shift_k] — a STATIC halo h = ceil(max |dir_x| *
dist_k / voxel_l) + 2 because the schedule is static.  Each shard
ppermute-exchanges h boundary rows with its neighbors once per level
group (not per step), then marches entirely locally.  Levels whose halo
would exceed the shard (tiny grids, very coarse levels) replicate — at
512^3/4-way the fine levels shard (h ~ 20 rows vs 128-row shards) and
levels <= 64^3 replicate (64^3 f32 RGBA = 4 MB, noise).

Everything is jit + shard_map over the ('data','model') mesh; gradient
flow works through ppermute, so the inverse pass shards the same way.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vct_tpu.core import dense as D
from vct_tpu.core import march as M

Array = jax.Array


def _halo_for_level(dirs: np.ndarray, dists, steps, dl: int,
                    world_size: float) -> int:
    """Static x-halo (level rows) for the steps touching one level."""
    voxel = world_size / dl
    m = 0.0
    for k in steps:
        m = max(m, float(np.max(np.abs(dirs[:, 0]))) * dists[k] / voxel)
    return int(np.ceil(m)) + 2


def _halo_pad_x(local: Array, h: int, axis_name: str, n: int) -> Array:
    """(lx, ...) -> (lx+2h, ...): h rows from each x neighbor via ppermute;
    outer shards pad with their own edge rows (values never read — global
    indices are edge-clamped — but keep them finite)."""
    if h == 0:
        return local
    left = jax.lax.ppermute(      # receive left neighbor's top rows
        local[-h:], axis_name, [(i, i + 1) for i in range(n - 1)])
    right = jax.lax.ppermute(     # receive right neighbor's bottom rows
        local[:h], axis_name, [(i, i - 1) for i in range(1, n)])
    idx = jax.lax.axis_index(axis_name)
    edge_l = jnp.repeat(local[:1], h, axis=0)
    edge_r = jnp.repeat(local[-1:], h, axis=0)
    left = jnp.where(idx == 0, edge_l, left)
    right = jnp.where(idx == n - 1, edge_r, right)
    return jnp.concatenate([left, local, right], axis=0)


def sharded_directional_march_multi(
    mips: Sequence[Array],
    directions,                          # (B, 3) static unit directions
    schedule: M.MarchSchedule,
    world_size: float,
    mesh: Mesh,
    axis_name: str = "model",
    field_dim: Optional[int] = None,
    max_alpha: float = 0.95,
    occlusion_falloff: float = 0.03,
    opacity_gain: float = 1.0,
    transmittance_only: bool = False,
    min_shard_rows: int = 8,
) -> Array:
    """Brick-sharded directional_march_multi: same results, field and fine
    mip levels sharded along x over `axis_name`.

    Returns (B, df, df, df, 4|1) with axis 1 sharded P(axis_name).
    Anisotropic stacks are not sharded yet — use the replicated path.
    """
    if len(mips) > 1 and mips[1].ndim == 5:
        raise NotImplementedError("brick sharding is isotropic-only for now")
    n = mesh.shape[axis_name]
    d0 = mips[0].shape[0]
    df = field_dim or d0
    dtype = mips[0].dtype
    dirs = np.asarray(directions, np.float64)
    if dirs.ndim == 1:
        dirs = dirs[None]
    nb = dirs.shape[0]
    if df % n:
        raise ValueError(f"field_dim {df} not divisible by {n} shards")
    ldf = df // n

    plan, groups = D.plan_groups(schedule.lods, len(mips))

    # per-level: steps touching it, halo, shardable?
    touch = {}
    for k, (l0, l1, w) in enumerate(plan):
        touch.setdefault(l0, []).append(k)
        if w > 0.0 and l1 != l0:
            touch.setdefault(l1, []).append(k)
    halos = {}
    sharded = {}
    for lvl, steps in touch.items():
        dl = mips[lvl].shape[0]
        h = _halo_for_level(dirs, schedule.dists, steps, dl, world_size)
        ok = (dl % n == 0) and (dl // n >= max(min_shard_rows, h + 1))
        halos[lvl] = h if ok else 0
        sharded[lvl] = ok

    # prepacked global per-axis indices, as in dense.axis_pack
    def axis_pack(steps, lvl):
        dl = mips[lvl].shape[0]
        i0s = np.empty((nb, len(steps), 3, df), np.int32)
        i1s = np.empty_like(i0s)
        fs = np.empty((nb, len(steps), 3, df), np.float32)
        for b in range(nb):
            for s, k in enumerate(steps):
                shift = dirs[b] * schedule.dists[k] / (world_size / dl)
                for ax in range(3):
                    i0, i1, f = D._axis_indices(df, dl, float(shift[ax]))
                    i0s[b, s, ax] = i0
                    i1s[b, s, ax] = i1
                    fs[b, s, ax] = f
        return jnp.asarray(i0s), jnp.asarray(i1s), jnp.asarray(fs)

    xs_all = []
    for (l0, l1), steps in groups:
        xs = {"a": axis_pack(steps, l0)}
        if l1 != l0:
            xs["b"] = axis_pack(steps, l1)
            xs["w"] = jnp.tile(
                jnp.asarray([plan[k][2] for k in steps], jnp.float32),
                (nb, 1))
        xs["atten"] = jnp.tile(jnp.asarray(
            [1.0 + occlusion_falloff * schedule.diameters[k] for k in steps],
            jnp.float32), (nb, 1))
        xs_all.append(xs)

    # only levels the schedule touches matter; untouched ones ride along
    for lvl in range(len(mips)):
        if lvl not in sharded:
            sharded[lvl] = False
            halos[lvl] = 0
    mip_specs = tuple(
        P(axis_name) if sharded[lvl] else P()
        for lvl in range(len(mips)))

    def _take3_local(level_blk: Array, i0, i1, f, row0, h: int,
                     shard_rows: int):
        """dense._take3 with x rows sliced to this shard and x columns
        rebased into the halo block. i0/i1/f: (3, df) global."""
        dl_blk = level_blk.shape[0]

        def xslice(v):
            return jax.lax.dynamic_slice_in_dim(v, row0 * ldf, ldf, axis=-1)

        ix0 = xslice(i0[0])
        ix1 = xslice(i1[0])
        fx = xslice(f[0])
        if h >= 0 and shard_rows > 0:    # sharded level: rebase into block
            base = row0 * shard_rows - h
            ix0 = jnp.clip(ix0 - base, 0, dl_blk - 1)
            ix1 = jnp.clip(ix1 - base, 0, dl_blk - 1)
        wx = D._interp_matrix(ix0, ix1, fx, dl_blk)
        wy = D._interp_matrix(i0[1], i1[1], f[1], level_blk.shape[1])
        wz = D._interp_matrix(i0[2], i1[2], f[2], level_blk.shape[2])
        out = jnp.einsum("ad,dyzc->ayzc", wx, level_blk)
        out = jnp.einsum("bd,adzc->abzc", wy, out)
        out = jnp.einsum("ed,abdc->abec", wz, out)
        return out

    def shard_body(*args):
        mips_loc = args[:len(mips)]
        xs_groups = args[len(mips):]
        row0 = jax.lax.axis_index(axis_name)

        # halo-pad each sharded level once, up front
        blocks = []
        for lvl, m in enumerate(mips_loc):
            if sharded[lvl]:
                blocks.append(_halo_pad_x(m, halos[lvl], axis_name, n))
            else:
                blocks.append(m)

        def march_one(xs_list):
            t = jnp.ones((ldf, df, df, 1), dtype)
            color = (None if transmittance_only
                     else jnp.zeros((ldf, df, df, 3), dtype))
            occ = (None if transmittance_only
                   else jnp.zeros((ldf, df, df, 1), dtype))
            carry = (t,) if transmittance_only else (t, color, occ)
            for ((l0, l1), steps), xs in zip(groups, xs_list):
                two = l1 != l0
                blk_a, blk_b = blocks[l0], blocks[l1]
                srows_a = mips[l0].shape[0] // n if sharded[l0] else 0
                srows_b = mips[l1].shape[0] // n if sharded[l1] else 0
                h_a = halos[l0] if sharded[l0] else -1
                h_b = halos[l1] if sharded[l1] else -1

                def body(carry, x, two=two, blk_a=blk_a, blk_b=blk_b,
                         srows_a=srows_a, srows_b=srows_b, h_a=h_a, h_b=h_b):
                    s = _take3_local(blk_a, x["a"][0], x["a"][1], x["a"][2],
                                     row0, h_a, srows_a)
                    if two:
                        s1 = _take3_local(blk_b, x["b"][0], x["b"][1],
                                          x["b"][2], row0, h_b, srows_b)
                        s = s * (1.0 - x["w"]) + s1 * x["w"]
                    a = s[..., -1:]
                    if opacity_gain != 1.0:
                        a = jnp.minimum(a * opacity_gain, 1.0)
                    if schedule.step_factor != 1.0:
                        keep = (1.0 - a) ** schedule.step_factor
                    else:
                        keep = 1.0 - a
                    if transmittance_only:
                        return (carry[0] * keep,), None
                    t, color, occ = carry
                    rgb = s[..., :3]
                    if schedule.step_factor != 1.0:
                        # optical-depth correction — mirror of
                        # core/dense.py's march body (r4)
                        scale = jnp.where(
                            a > 1e-6,
                            (1.0 - keep) / jnp.maximum(a, 1e-6),
                            schedule.step_factor)
                        rgb = rgb * scale
                        a = 1.0 - keep
                    active = (1.0 - t) < max_alpha
                    wgt = jnp.where(active, t, 0.0)
                    color = color + wgt * rgb
                    occ = occ + wgt * a / x["atten"]
                    t = jnp.where(active, t * keep, t)
                    return (t, color, occ), None

                if len(steps) == 1:
                    carry, _ = body(carry, jax.tree_util.tree_map(
                        lambda v: v[0], xs))
                else:
                    carry, _ = jax.lax.scan(body, carry, xs)
            if transmittance_only:
                return carry[0]
            t, color, occ = carry
            return jnp.concatenate([color, occ], axis=-1)

        return jax.vmap(march_one)(list(xs_groups))

    xs_specs = tuple(
        jax.tree_util.tree_map(lambda _: P(), xs) for xs in xs_all)
    fn = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=mip_specs + xs_specs,
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    return fn(*mips, *xs_all)


def sharded_directional_march(
    mips: Sequence[Array], direction, schedule: M.MarchSchedule,
    world_size: float, mesh: Mesh, **kw) -> Array:
    """Single-direction brick-sharded march (see multi)."""
    out = sharded_directional_march_multi(
        mips, np.asarray(direction, np.float64)[None], schedule, world_size,
        mesh, **kw)
    return out[0]


def brick_sharding(mesh: Mesh, axis_name: str = "model") -> NamedSharding:
    """Sharding for an (x, y, z, c) level bricked along x."""
    return NamedSharding(mesh, P(axis_name))


def shard_mips(mesh: Mesh, mips: Sequence[Array], n_min_rows: int = 8,
               axis_name: str = "model"):
    """Place fine levels bricked along x, coarse levels replicated."""
    n = mesh.shape[axis_name]
    out = []
    for m in mips:
        dl = m.shape[0]
        if dl % n == 0 and dl // n >= n_min_rows:
            out.append(jax.device_put(m, brick_sharding(mesh, axis_name)))
        else:
            out.append(jax.device_put(m, NamedSharding(mesh, P())))
    return tuple(out)
