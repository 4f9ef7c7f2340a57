"""Tiled VAE decoding for high-resolution / long videos.

Capability parity with reference LTX_2_MLX/model/video_vae/tiling.py:
TilingConfig validation (spatial tiles >=64px %32, temporal >=16f %8,
defaults 512px/64px overlap + 64f/24f overlap, tiling.py:55-122), tile-spec
generation, and weighted accumulation with per-axis trapezoidal ramp masks.

TPU-first: each tile decodes as one jitted call (shapes bucketed, so a few
compilations cover all tiles); the weighted blend accumulates host-side in
numpy — output pixels are leaving the device anyway, and this avoids the
reference's O(tiles * volume) concatenation dance (tiling.py:415-475).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Iterator, List, Optional, Tuple

import jax
import numpy as np


def compute_trapezoidal_mask_1d(
    length: int,
    ramp_left: int,
    ramp_right: int,
    left_starts_from_0: bool = False,
) -> np.ndarray:
    """1D trapezoidal blending mask (tiling.py:9-52)."""
    if length <= 0:
        raise ValueError("Mask length must be positive.")

    ramp_left = max(0, min(ramp_left, length))
    ramp_right = max(0, min(ramp_right, length))

    mask = np.ones((length,), np.float32)
    if ramp_left > 0:
        interval = ramp_left + 1 if left_starts_from_0 else ramp_left + 2
        fade_in = np.linspace(0.0, 1.0, interval, dtype=np.float32)[:-1]
        if not left_starts_from_0:
            fade_in = fade_in[1:]
        mask[:ramp_left] = fade_in
    if ramp_right > 0:
        mask[length - ramp_right :] = np.linspace(
            1.0, 0.0, ramp_right + 2, dtype=np.float32
        )[1:-1]
    return np.clip(mask, 0, 1)


@dataclass(frozen=True)
class SpatialTilingConfig:
    tile_size_in_pixels: int
    tile_overlap_in_pixels: int = 0

    def __post_init__(self) -> None:
        if self.tile_size_in_pixels < 64:
            raise ValueError(
                f"tile_size_in_pixels must be at least 64, got {self.tile_size_in_pixels}"
            )
        if self.tile_size_in_pixels % 32 != 0:
            raise ValueError(
                f"tile_size_in_pixels must be divisible by 32, got {self.tile_size_in_pixels}"
            )
        if self.tile_overlap_in_pixels % 32 != 0:
            raise ValueError(
                f"tile_overlap_in_pixels must be divisible by 32, got {self.tile_overlap_in_pixels}"
            )
        if self.tile_overlap_in_pixels >= self.tile_size_in_pixels:
            raise ValueError(
                f"Overlap must be less than tile size, got "
                f"{self.tile_overlap_in_pixels} and {self.tile_size_in_pixels}"
            )


@dataclass(frozen=True)
class TemporalTilingConfig:
    tile_size_in_frames: int
    tile_overlap_in_frames: int = 0

    def __post_init__(self) -> None:
        if self.tile_size_in_frames < 16:
            raise ValueError(
                f"tile_size_in_frames must be at least 16, got {self.tile_size_in_frames}"
            )
        if self.tile_size_in_frames % 8 != 0:
            raise ValueError(
                f"tile_size_in_frames must be divisible by 8, got {self.tile_size_in_frames}"
            )
        if self.tile_overlap_in_frames % 8 != 0:
            raise ValueError(
                f"tile_overlap_in_frames must be divisible by 8, got {self.tile_overlap_in_frames}"
            )
        if self.tile_overlap_in_frames >= self.tile_size_in_frames:
            raise ValueError(
                f"Overlap must be less than tile size, got "
                f"{self.tile_overlap_in_frames} and {self.tile_size_in_frames}"
            )


@dataclass(frozen=True)
class TilingConfig:
    spatial_config: Optional[SpatialTilingConfig] = None
    temporal_config: Optional[TemporalTilingConfig] = None

    @classmethod
    def default(cls) -> "TilingConfig":
        return cls(
            spatial_config=SpatialTilingConfig(
                tile_size_in_pixels=512, tile_overlap_in_pixels=64
            ),
            temporal_config=TemporalTilingConfig(
                tile_size_in_frames=64, tile_overlap_in_frames=24
            ),
        )


@dataclass
class TileSpec:
    in_t_start: int
    in_t_end: int
    in_h_start: int
    in_h_end: int
    in_w_start: int
    in_w_end: int
    out_t_start: int
    out_t_end: int
    out_h_start: int
    out_h_end: int
    out_w_start: int
    out_w_end: int
    ramp_t_left: int
    ramp_t_right: int
    ramp_h_left: int
    ramp_h_right: int
    ramp_w_left: int
    ramp_w_right: int


def _gen_tiles_1d(length: int, tile_size: int, overlap: int) -> List[Tuple[int, int, int, int]]:
    """(start, end, ramp_left, ramp_right) tiles covering [0, length)."""
    if length <= tile_size:
        return [(0, length, 0, 0)]
    tiles = []
    stride = tile_size - overlap
    pos = 0
    while pos < length:
        end = min(pos + tile_size, length)
        start = max(0, end - tile_size)
        tiles.append(
            (start, end, overlap if start > 0 else 0, overlap if end < length else 0)
        )
        if end >= length:
            break
        pos += stride
    return tiles


def generate_tile_specs(
    latent_shape: Tuple[int, int, int, int, int],
    tiling_config: TilingConfig,
    scale_factors: Tuple[int, int, int] = (8, 32, 32),
) -> List[TileSpec]:
    """Tile specs over the latent grid (tiling.py:154-249)."""
    _, _, t, h, w = latent_shape
    scale_t, scale_h, scale_w = scale_factors

    if tiling_config.spatial_config:
        sc = tiling_config.spatial_config
        tile_h, tile_w = sc.tile_size_in_pixels // scale_h, sc.tile_size_in_pixels // scale_w
        ov_h, ov_w = sc.tile_overlap_in_pixels // scale_h, sc.tile_overlap_in_pixels // scale_w
    else:
        tile_h, tile_w, ov_h, ov_w = h, w, 0, 0

    if tiling_config.temporal_config:
        tc = tiling_config.temporal_config
        tile_t, ov_t = tc.tile_size_in_frames // scale_t, tc.tile_overlap_in_frames // scale_t
    else:
        tile_t, ov_t = t, 0

    specs = []
    for ts, te, rtl, rtr in _gen_tiles_1d(t, tile_t, ov_t):
        for hs, he, rhl, rhr in _gen_tiles_1d(h, tile_h, ov_h):
            for ws, we, rwl, rwr in _gen_tiles_1d(w, tile_w, ov_w):
                specs.append(
                    TileSpec(
                        in_t_start=ts, in_t_end=te,
                        in_h_start=hs, in_h_end=he,
                        in_w_start=ws, in_w_end=we,
                        out_t_start=ts * scale_t if ts > 0 else 0,
                        out_t_end=(te - 1) * scale_t + 1 if te > 1 else 1,
                        out_h_start=hs * scale_h, out_h_end=he * scale_h,
                        out_w_start=ws * scale_w, out_w_end=we * scale_w,
                        ramp_t_left=rtl * scale_t, ramp_t_right=rtr * scale_t,
                        ramp_h_left=rhl * scale_h, ramp_h_right=rhr * scale_h,
                        ramp_w_left=rwl * scale_w, ramp_w_right=rwr * scale_w,
                    )
                )
    return specs


def _decode_tiles_data_parallel(specs, tile_of, decoder_fn, timestep, b, mesh, data_axis):
    """Yield (spec, decoded) with same-shape tiles batched over `data_axis`.

    Rounds of n_devices tiles stack tile-major along the batch axis; short
    rounds pad with the first tile (wasted lanes, discarded). Per-device
    working set stays one tile — only the round's outputs are alive at once.
    """
    from collections import defaultdict

    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = dict(mesh.shape).get(data_axis, 1)
    sharding = NamedSharding(mesh, P(data_axis, None, None, None, None))

    groups = defaultdict(list)
    for spec in specs:
        shape = (
            spec.in_t_end - spec.in_t_start,
            spec.in_h_end - spec.in_h_start,
            spec.in_w_end - spec.in_w_start,
        )
        groups[shape].append(spec)

    for group in groups.values():
        for i in range(0, len(group), ndev):
            round_specs = group[i : i + ndev]
            tiles = [np.asarray(tile_of(s)) for s in round_specs]
            tiles += [tiles[0]] * (ndev - len(round_specs))
            stacked = jax.device_put(np.concatenate(tiles, axis=0), sharding)
            decoded = np.asarray(decoder_fn(stacked, timestep=timestep))
            for j, spec in enumerate(round_specs):
                yield spec, decoded[j * b : (j + 1) * b]


def decode_tiled(
    latent,
    decoder_fn,
    tiling_config: TilingConfig,
    timestep: Optional[float] = 0.05,
    scale_factors: Tuple[int, int, int] = (8, 32, 32),
    mesh=None,
    data_axis: str = "data",
) -> Iterator[np.ndarray]:
    """Decode per-tile, blend with trapezoidal weights, normalize
    (tiling.py:252-412). decoder_fn(latent_tile, timestep) -> (B,3,t,h,w).

    With `mesh`, tiles decode data-parallel over its `data_axis`: same-shape
    tiles stack along the batch axis in rounds of n_devices, the stacked
    batch lands sharded (one tile per chip — the conv decoder is pointwise
    across batch, so GSPMD splits it with zero communication), and each
    round costs one decoder call instead of n. Tile specs are identical to
    the sequential path, so blending weights and output layout match
    exactly. (When the decoder injects decode noise, tiles in one round draw
    DIFFERENT noise than repeated single-tile calls would — same
    distribution, different stream.)

    Yields the final blended (B, 3, T_out, H_out, W_out) float array.
    """
    b, _c, t, h, w = latent.shape
    scale_t, scale_h, scale_w = scale_factors
    specs = generate_tile_specs(tuple(latent.shape), tiling_config, scale_factors)

    out_t = (t - 1) * scale_t + 1
    out_h = h * scale_h
    out_w = w * scale_w
    output = np.zeros((b, 3, out_t, out_h, out_w), np.float32)
    weights = np.zeros((1, 1, out_t, out_h, out_w), np.float32)

    def tile_of(spec):
        return latent[
            :, :,
            spec.in_t_start : spec.in_t_end,
            spec.in_h_start : spec.in_h_end,
            spec.in_w_start : spec.in_w_end,
        ]

    if mesh is None:
        decoded_tiles = (
            (spec, np.asarray(decoder_fn(tile_of(spec), timestep=timestep)))
            for spec in specs
        )
    else:
        decoded_tiles = _decode_tiles_data_parallel(
            specs, tile_of, decoder_fn, timestep, b, mesh, data_axis
        )

    for spec, decoded in decoded_tiles:
        dt, dh, dw = decoded.shape[2:]
        tile_t = min(dt, spec.out_t_end - spec.out_t_start)
        tile_h = min(dh, spec.out_h_end - spec.out_h_start)
        tile_w = min(dw, spec.out_w_end - spec.out_w_start)

        mask = (
            compute_trapezoidal_mask_1d(
                tile_t,
                min(spec.ramp_t_left, tile_t),
                min(spec.ramp_t_right, tile_t),
                left_starts_from_0=(spec.out_t_start == 0),
            )[None, None, :, None, None]
            * compute_trapezoidal_mask_1d(
                tile_h, min(spec.ramp_h_left, tile_h), min(spec.ramp_h_right, tile_h)
            )[None, None, None, :, None]
            * compute_trapezoidal_mask_1d(
                tile_w, min(spec.ramp_w_left, tile_w), min(spec.ramp_w_right, tile_w)
            )[None, None, None, None, :]
        )

        sl = (
            slice(None),
            slice(None),
            slice(spec.out_t_start, spec.out_t_start + tile_t),
            slice(spec.out_h_start, spec.out_h_start + tile_h),
            slice(spec.out_w_start, spec.out_w_start + tile_w),
        )
        output[sl] += decoded[:, :, :tile_t, :tile_h, :tile_w] * mask
        weights[sl] += mask

    yield output / np.maximum(weights, 1e-8)


def decode_w_sharded(
    latent,
    params,
    cfg,
    mesh,
    axis: str = "data",
    timestep: Optional[float] = 0.05,
    key: Optional[jax.Array] = None,
    causal: bool = False,
):
    """Decode ONE oversized frame/clip with the W dim sharded over `axis`.

    Unlike tile-DP (`decode_tiled(mesh=...)`, which replicates whole tiles
    one per chip and needs >= n_devices tiles), this shards a SINGLE decode:
    the latent splits along W, every conv exchanges explicit 1-column halos
    with ring neighbors (`conv._pad_w_halo` — correct down to 1-wide
    shards, where GSPMD's automatic conv partitioning miscomputes), and all
    other decoder ops are pointwise over W. Per-chip activation memory and
    FLOPs scale ~1/n; the halo traffic is 2 columns per conv over ICI.

    `key`: decode-noise key; folded with the shard index so each shard
    draws independent noise (same distribution as unsharded, different
    stream). None disables noise injection (bit-comparable to the
    unsharded decoder).

    Returns the decoded video as a GLOBAL jax array whose pixel W axis is
    still sharded over `axis` (out_specs P(..., axis)); indexing it
    device-locally yields 1/n of the width per chip, and consumers that
    need replication (host transfer, full-frame ops) trigger the
    all-gather at that point rather than here.
    """
    if latent.ndim == 4:
        latent = latent[None]
    n = dict(mesh.shape)[axis]
    if latent.shape[-1] % n != 0:
        raise ValueError(
            f"latent W ({latent.shape[-1]}) must be divisible by the "
            f"'{axis}' axis size ({n})"
        )
    fn = _w_sharded_decoder(cfg, mesh, axis, timestep, causal, key is None)
    return fn(params, latent, key)


@lru_cache(maxsize=16)
def _w_sharded_decoder(cfg, mesh, axis, timestep, causal, no_key):
    """Cached jitted W-sharded decoder — a fresh jit per call would
    re-trace (and, cold, re-compile) the whole decoder on EVERY request."""
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from ltx2_tpu.models.video_vae.decoder import video_decoder_apply

    def body(p, z, k):
        if k is not None:
            k = _jax.random.fold_in(k, _jax.lax.axis_index(axis))
        return video_decoder_apply(
            p, cfg, z, timestep=timestep, noise_key=k, causal=causal,
            w_halo_axis=axis,
        )

    def run(params, latent, key):
        param_specs = _jax.tree_util.tree_map(lambda _: P(), params)
        fn = _jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                param_specs,
                P(None, None, None, None, axis),
                None if no_key else P(),
            ),
            out_specs=P(None, None, None, None, axis),
            axis_names=frozenset({axis}),
        )
        return fn(params, latent, key)

    return _jax.jit(run)


def should_auto_tile(latent_shape: Tuple[int, ...], voxel_threshold: int = 4000) -> bool:
    """Auto-enable tiling when latent voxels exceed the threshold
    (one_stage.py:74-84)."""
    _, _, t, h, w = latent_shape
    return t * h * w > voxel_threshold
