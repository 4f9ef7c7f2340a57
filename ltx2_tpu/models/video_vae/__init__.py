from ltx2_tpu.models.video_vae.chunking import decode_latent, latent_t_to_pixel_t
from ltx2_tpu.models.video_vae.decoder import (
    DEFAULT_DECODER_BLOCKS,
    VideoDecoderConfig,
    init_video_decoder,
    normalize_decoder_blocks,
    video_decoder_apply,
)
from ltx2_tpu.models.video_vae.encoder import (
    VideoEncoderConfig,
    encode_video,
    init_video_encoder,
    video_encoder_apply,
)
from ltx2_tpu.models.video_vae.full_vae import (
    FullVideoDecoderConfig,
    FullVideoEncoderConfig,
    full_video_decoder_apply,
    full_video_encoder_apply,
    init_full_video_decoder,
    init_full_video_encoder,
)
from ltx2_tpu.models.video_vae.ops import (
    normalize_latent,
    patchify,
    pixel_norm,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    un_normalize_latent,
    unpatchify,
)
from ltx2_tpu.models.video_vae.tiling import (
    SpatialTilingConfig,
    TemporalTilingConfig,
    TileSpec,
    TilingConfig,
    compute_trapezoidal_mask_1d,
    decode_tiled,
    generate_tile_specs,
    should_auto_tile,
)
from ltx2_tpu.models.video_vae.weights import (
    decoder_config_from_checkpoint,
    load_video_decoder_params,
    load_video_encoder_params,
)

__all__ = [
    "decode_latent",
    "latent_t_to_pixel_t",
    "DEFAULT_DECODER_BLOCKS",
    "VideoDecoderConfig",
    "init_video_decoder",
    "normalize_decoder_blocks",
    "video_decoder_apply",
    "VideoEncoderConfig",
    "encode_video",
    "init_video_encoder",
    "video_encoder_apply",
    "FullVideoDecoderConfig",
    "FullVideoEncoderConfig",
    "full_video_decoder_apply",
    "full_video_encoder_apply",
    "init_full_video_decoder",
    "init_full_video_encoder",
    "normalize_latent",
    "patchify",
    "pixel_norm",
    "pixel_shuffle_3d",
    "pixel_unshuffle_3d",
    "un_normalize_latent",
    "unpatchify",
    "SpatialTilingConfig",
    "TemporalTilingConfig",
    "TileSpec",
    "TilingConfig",
    "compute_trapezoidal_mask_1d",
    "decode_tiled",
    "generate_tile_specs",
    "should_auto_tile",
    "decoder_config_from_checkpoint",
    "load_video_decoder_params",
    "load_video_encoder_params",
]
