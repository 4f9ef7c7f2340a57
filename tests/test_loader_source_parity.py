"""Loader key-layout parity derived FROM THE REFERENCE SOURCE itself.

The r2 verdict's #1 standing risk: our checkpoint key rewrites were
verified against synthetic checkpoints built by inverting our OWN rules —
a shared misreading of the reference would pass silently. These tests
remove the self-reference: they PARSE the reference implementation's
converter source (`LTX_2_MLX/loader/weight_converter.py`) at test time,
extract its re.sub rewrite rules and skip conditions as DATA, then

1. assert our KEY_REWRITE_RULES are exactly that rule set, and
2. EXECUTE the extracted reference rules (plain regexes — no MLX needed)
   against a battery of realistic checkpoint keys and assert our
   `convert_checkpoint_key` produces identical outputs (including skips).

Also pins the hyphenated per-channel-statistics keys and the
diffusion-model prefix against the strings the reference source uses.

Skipped when the reference tree is not present (this is an
environment-coupled parity check, not a unit test).
"""

import re
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/LTX_2_MLX")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not available"
)


def _reference_converter_source() -> str:
    return (REFERENCE / "loader" / "weight_converter.py").read_text()


def _function_body(source: str, name: str) -> str:
    """Extract one top-level function's body by indentation."""
    lines = source.splitlines()
    start = next(
        i for i, ln in enumerate(lines) if ln.startswith(f"def {name}(")
    )
    body = []
    for ln in lines[start + 1:]:
        if ln and not ln.startswith((" ", "\t", ")")):
            break
        body.append(ln)
    return "\n".join(body)


_RESUB = re.compile(r're\.sub\(\s*r"([^"]+)"\s*,\s*"([^"]+)"\s*,\s*key\s*\)')


def _reference_rewrite_rules():
    body = _function_body(_reference_converter_source(), "convert_pytorch_key_to_mlx")
    return _RESUB.findall(body)


def _reference_convert(key: str, include_audio: bool):
    """Execute the reference's conversion semantics with rules extracted
    from ITS source: skip gates + the re.sub chain, in source order."""
    body = _function_body(
        _reference_converter_source(), "convert_pytorch_key_to_mlx"
    )
    # Skip gates, asserted to exist in the source so this stays an
    # extraction rather than a re-implementation.
    assert '"av_ca" in key or "a2v" in key or "audio" in key.lower()' in body
    assert '"video_embeddings_connector" in key' in body
    if not include_audio and (
        "av_ca" in key or "a2v" in key or "audio" in key.lower()
    ):
        return None
    if "video_embeddings_connector" in key or "audio_embeddings_connector" in key:
        return None
    for pattern, repl in _RESUB.findall(body):
        key = re.sub(pattern, repl, key)
    return key


KEY_BATTERY = [
    "transformer_blocks.0.attn1.to_q.weight",
    "transformer_blocks.0.attn1.to_out.0.weight",
    "transformer_blocks.0.attn1.to_out.0.bias",
    "transformer_blocks.17.attn2.to_out.0.weight",
    "transformer_blocks.3.ff.net.0.proj.weight",
    "transformer_blocks.3.ff.net.0.proj.bias",
    "transformer_blocks.3.ff.net.2.weight",
    "transformer_blocks.5.audio_ff.net.0.proj.weight",
    "transformer_blocks.5.audio_ff.net.2.bias",
    "transformer_blocks.9.audio_attn1.to_out.0.weight",
    "transformer_blocks.2.scale_shift_table",
    "transformer_blocks.2.audio_scale_shift_table",
    "transformer_blocks.4.audio_to_video_attn.to_q.weight",
    "transformer_blocks.4.scale_shift_table_a2v_ca_audio",
    "adaln_single.linear.weight",
    "caption_projection.linear_1.weight",
    "patchify_proj.weight",
    "proj_out.weight",
    "av_ca_video_scale_shift_adaln_single.linear.weight",
    "video_embeddings_connector.blocks.0.attn.to_q.weight",
    "audio_embeddings_connector.blocks.0.attn.to_q.weight",
]


class TestRewriteRulesMatchReferenceSource:
    def test_rule_sets_identical(self):
        from ltx2_tpu.loader.weight_loader import KEY_REWRITE_RULES

        ref_rules = _reference_rewrite_rules()
        assert ref_rules, "failed to extract any re.sub rules from reference"
        assert set(KEY_REWRITE_RULES) == set(ref_rules), (
            f"rule mismatch:\n ours={sorted(KEY_REWRITE_RULES)}\n"
            f" reference={sorted(ref_rules)}"
        )

    @pytest.mark.parametrize("include_audio", [False, True])
    def test_battery_matches_executed_reference_rules(self, include_audio):
        from ltx2_tpu.loader.weight_loader import convert_checkpoint_key

        for key in KEY_BATTERY:
            want = _reference_convert(key, include_audio)
            got = convert_checkpoint_key(key, include_audio=include_audio)
            assert got == want, (
                f"{key!r} (include_audio={include_audio}): "
                f"ours={got!r} reference={want!r}"
            )

    def test_diffusion_prefix_matches(self):
        from ltx2_tpu.loader.weight_loader import DIFFUSION_PREFIX

        src = _reference_converter_source()
        assert DIFFUSION_PREFIX == "model.diffusion_model."
        assert 'replace("model.diffusion_model.", "")' in src or (
            '"model.diffusion_model."' in src
        )


class TestStatKeysMatchReferenceSource:
    def test_video_vae_hyphenated_stat_keys(self):
        from ltx2_tpu.models.video_vae.ops import STAT_KEY_MAP

        src = (REFERENCE / "model" / "video_vae" / "simple_decoder.py").read_text()
        ref_pairs = re.findall(
            r'\("([a-z-]+)",\s*"([a-z_]+)"\)', src
        )
        ref_stats = {
            (ck, attr) for ck, attr in ref_pairs if "means" in ck
        }
        assert ref_stats, "failed to extract stat pairs from reference"
        for ck, attr in ref_stats:
            assert STAT_KEY_MAP.get(ck) == attr, (
                f"stat key {ck!r}: ours={STAT_KEY_MAP.get(ck)!r} ref={attr!r}"
            )
        assert 'f"vae.per_channel_statistics.{stat_key}"' in src

    def test_audio_vae_stat_key_strings(self):
        src = (REFERENCE / "model" / "audio_vae" / "decoder.py").read_text()
        ours = Path("ltx2_tpu/models/audio_vae/decoder.py").read_text()
        for key in (
            "audio_vae.per_channel_statistics.mean-of-means",
            "audio_vae.per_channel_statistics.std-of-means",
        ):
            assert key in src, f"reference no longer uses {key!r}"
            assert key in ours, f"our loader does not query {key!r}"
