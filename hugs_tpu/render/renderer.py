"""Public rendering API.

Behavioral equivalent of the reference renderer entry points
(hugs/renderer/gs_renderer.py:20-161): `render` takes flat Gaussian
attributes + camera and returns {render, radii, visibility_filter, ...};
`render_human_scene` merges the human and scene Gaussian sets (human
first, as the reference's visibility-slice bookkeeping assumes,
gs_renderer.py:32-38,84-98) into one depth-sorted blend.

Differences from the reference, by design (TPU-first):
  - static shapes everywhere: inputs may carry an `alive` capacity mask;
    culled/dead Gaussians simply render with radius 0.
  - screen-space densification gradients are exposed functionally: pass a
    zeros (N, 2) `mean2d_grad_hook`; d(loss)/d(hook) IS the viewspace
    gradient the densifier wants (no .retain_grad() mutation trick).
  - backend='oracle' | 'tiled' (XLA) | 'pallas' (TPU kernel).
"""
from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp

from hugs_tpu.render.camera import Camera
from hugs_tpu.render.project import project_gaussians, update_mean2d
from hugs_tpu.render.tiles import ALIGN, bin_gaussians, TILE
from hugs_tpu.render.blend import blend_tiles
from hugs_tpu.render.oracle import render_oracle


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotq: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    camera: Camera,
    width: int,
    height: int,
    bg: jnp.ndarray | None = None,
    active_sh_degree: jnp.ndarray | int = 0,
    scaling_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
    mean2d_grad_hook: jnp.ndarray | None = None,
    backend: str = "tiled",
    instance_budget: int | None = None,
    tile_cap: int = 1024,
    tile: int | None = None,
    power_mxu: bool | None = None,
    gauss_mesh=None,
    gauss_frag_cap: int | None = None,
) -> dict[str, Any]:
    """Render one view. Returns dict with 'render' (3, H, W), 'radii' (N,),
    'visibility_filter' (N,) bool, 'overflowed' (scalar bool diagnostics).

    gauss_mesh: a ('gauss',)-axis jax.sharding.Mesh routes the blend
    through the Gaussian-sharded renderer (parallel/gauss_shard.py:
    primitives sharded over chips, one fragment all_to_all over ICI) —
    the serving path for Gaussian sets too large to replicate per chip.
    instance_budget is interpreted as the GLOBAL budget (split evenly
    per chip); gauss_frag_cap bounds the per-(sender, band) exchange
    packet. Eval/serving only: no densification hook."""
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if gauss_mesh is not None:
        from hugs_tpu.parallel.gauss_shard import render_gauss_sharded
        ndev = gauss_mesh.shape["gauss"]
        local_budget = (max(instance_budget // ndev, 1 << 12)
                        if instance_budget else None)
        out = render_gauss_sharded(
            means3d, scales, rotq, opacity, shs, camera, width, height,
            gauss_mesh, bg=bg, active_sh_degree=active_sh_degree,
            scaling_modifier=scaling_modifier, alive=alive,
            local_budget=local_budget, frag_cap=gauss_frag_cap,
            tile_cap=tile_cap,
            tile=tile or (32 if backend == "pallas" else TILE),
            backend=backend, mean2d_grad_hook=mean2d_grad_hook)
        return {
            "render": out["render"],
            "radii": out["radii"],
            "visibility_filter": out["visibility_filter"],
            "overflowed": out["overflowed"],
            "n_instances": jnp.int32(0),
            "n_slots": jnp.int32(0),
            "frag_counts": out["frag_counts"],
        }
    pg = project_gaussians(means3d, scales, rotq, opacity, shs, camera,
                           width, height, active_sh_degree, scaling_modifier,
                           alive=alive)
    if mean2d_grad_hook is not None:
        pg = update_mean2d(pg, mean2d_grad_hook)  # keeps pg.feat in sync

    n_instances = jnp.int32(0)
    n_slots = jnp.int32(0)
    if backend == "oracle":
        img = render_oracle(pg, width, height, bg).transpose(2, 0, 1)
        overflowed = jnp.bool_(False)
    elif backend in ("tiled", "pallas"):
        if tile is None:
            # 32x32 tiles win for the Pallas kernel (fewest duplicated
            # instances; multi-tile cells amortize the per-tile cost);
            # 16x16 suits the capacity-padded XLA path
            tile = 32 if backend == "pallas" else TILE
        n = means3d.shape[0]
        budget = instance_budget or max(4 * n, 1 << 16)
        # only the Pallas DMA needs 128-aligned segments; the XLA path
        # blends the dense layout, so its budget carries no padding waste
        bins = bin_gaussians(pg, width, height, budget, tile,
                             align=1 if backend == "tiled" else ALIGN)
        n_instances = bins.n_instances  # true count, even past the budget
        n_slots = bins.n_slots          # slot demand incl. alignment pad
        if backend == "pallas":
            from hugs_tpu.render.pallas_blend import blend_tiles_pallas
            img = blend_tiles_pallas(pg, bins, width, height, bg, tile,
                                     power_mxu=power_mxu)
            overflowed = bins.overflowed
        else:
            from hugs_tpu.render.blend import tile_overflow
            img = blend_tiles(pg, bins, width, height, bg, tile_cap, tile)
            # the XLA path additionally truncates any tile denser than
            # tile_cap (blend.py one_tile) — surface that too
            overflowed = bins.overflowed | tile_overflow(bins, tile_cap)
    else:
        raise ValueError(f"unknown backend: {backend}")

    return {
        "render": img,
        "radii": pg.radius,
        "visibility_filter": pg.mask & (pg.radius > 0),
        "overflowed": overflowed,
        "n_instances": n_instances,
        "n_slots": n_slots,
    }


def render_human_scene(
    data: dict[str, Any],
    human_gs_out: dict[str, Any] | None,
    scene_gs_out: dict[str, Any] | None,
    bg_color: jnp.ndarray,
    human_bg_color: jnp.ndarray | None = None,
    scaling_modifier: float = 1.0,
    render_mode: str = "human_scene",
    render_human_separate: bool = False,
    backend: str = "tiled",
    **render_kw,
) -> dict[str, Any]:
    """Merged human+scene rendering, mirroring the reference semantics
    (gs_renderer.py:20-100). `data` carries the camera and image size:
    {'camera': Camera, 'width': int, 'height': int}.
    """
    camera: Camera = data["camera"]
    width, height = data["width"], data["height"]

    def cat(key):
        return jnp.concatenate([human_gs_out[key], scene_gs_out[key]], axis=0)

    if render_mode == "human_scene":
        attrs = {k: cat(k) for k in ("xyz", "scales", "rotq", "shs", "opacity")}
        alive = None
        if "alive" in human_gs_out or "alive" in scene_gs_out:
            ha = human_gs_out.get(
                "alive", jnp.ones(human_gs_out["xyz"].shape[0], bool))
            sa = scene_gs_out.get(
                "alive", jnp.ones(scene_gs_out["xyz"].shape[0], bool))
            alive = jnp.concatenate([ha, sa])
        sh_deg = human_gs_out["active_sh_degree"]
    elif render_mode == "human":
        attrs = {k: human_gs_out[k] for k in ("xyz", "scales", "rotq", "shs", "opacity")}
        alive = human_gs_out.get("alive")
        sh_deg = human_gs_out["active_sh_degree"]
    elif render_mode == "scene":
        attrs = {k: scene_gs_out[k] for k in ("xyz", "scales", "rotq", "shs", "opacity")}
        alive = scene_gs_out.get("alive")
        sh_deg = scene_gs_out["active_sh_degree"]
    else:
        raise ValueError(f"Unknown render mode: {render_mode}")

    pkg = render(attrs["xyz"], attrs["scales"], attrs["rotq"],
                 attrs["opacity"], attrs["shs"], camera, width, height,
                 bg=bg_color, active_sh_degree=sh_deg,
                 scaling_modifier=scaling_modifier, alive=alive,
                 backend=backend, **render_kw)

    if render_human_separate and render_mode == "human_scene":
        # The densification hook (if any) is sized for the MERGED set; the
        # separate human pass has only h_cap Gaussians, and the reference
        # takes viewspace grads from the main pass only
        # (gs_trainer.py:316-342) — so drop the hook here.
        sep_kw = {k: v for k, v in render_kw.items()
                  if k != "mean2d_grad_hook"}
        # Right-size the human-only pass's instance budget: binning/sort/
        # pack cost scales with the STATIC budget, and the human set is a
        # fraction of the merged one. Half the merged budget (32768-
        # aligned) is ample in practice; overflow is surfaced below so
        # the trainer's budget auto-growth reacts just like for the main
        # pass (growing the merged budget grows this one with it).
        if sep_kw.get("instance_budget"):
            sep_kw["instance_budget"] = max(
                4096, sep_kw["instance_budget"] // 2)
        hpkg = render(human_gs_out["xyz"], human_gs_out["scales"],
                      human_gs_out["rotq"], human_gs_out["opacity"],
                      human_gs_out["shs"], camera, width, height,
                      bg=(human_bg_color if human_bg_color is not None else bg_color),
                      active_sh_degree=human_gs_out["active_sh_degree"],
                      scaling_modifier=scaling_modifier,
                      alive=human_gs_out.get("alive"),
                      backend=backend, **sep_kw)
        pkg["human_img"] = hpkg["render"]
        pkg["human_visibility_filter"] = hpkg["visibility_filter"]
        pkg["human_radii"] = hpkg["radii"]
        # a dropped-instance humansep pass must trigger the same
        # grow-and-retry as the main pass: 2x the human-pass count so
        # the half-sized sep budget ends up large enough after growth
        pkg["overflowed"] = pkg["overflowed"] | hpkg["overflowed"]
        pkg["n_instances"] = jnp.maximum(pkg["n_instances"],
                                         2 * hpkg["n_instances"])
        pkg["n_slots"] = jnp.maximum(pkg["n_slots"], 2 * hpkg["n_slots"])

    if render_mode == "human":
        pkg["human_visibility_filter"] = pkg["visibility_filter"]
        pkg["human_radii"] = pkg["radii"]
    elif render_mode == "human_scene":
        n_h = human_gs_out["xyz"].shape[0]
        pkg["scene_visibility_filter"] = pkg["visibility_filter"][n_h:]
        pkg["scene_radii"] = pkg["radii"][n_h:]
        if "human_visibility_filter" not in pkg:
            pkg["human_visibility_filter"] = pkg["visibility_filter"][:n_h]
            pkg["human_radii"] = pkg["radii"][:n_h]
    elif render_mode == "scene":
        pkg["scene_visibility_filter"] = pkg["visibility_filter"]
        pkg["scene_radii"] = pkg["radii"]
    return pkg
