"""Prompt enhancement helpers.

Capability parity with reference LTX_2_MLX/utils/prompt_enhancement.py:
system prompts for Gemma-based prompt expansion, response cleanup, and
image preprocessing for I2V enhancement. (Disabled for QAT Gemma variants,
generate.py:325-337.)

Greedy Gemma decoding is provided on top of the same gemma3_apply stack used
for text encoding; the chat template mirrors Gemma-3's turn format.

Provenance: the *_SYSTEM_PROMPT strings below are verbatim reference
constants — they are behavioral data (the exact text conditions the LLM),
so copying them is the correct form of parity, not code reuse.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

T2V_SYSTEM_PROMPT = """You are a highly skilled video production expert tasked with transforming simple user prompts into rich, cinematic video descriptions. Your goal is to take the user's basic idea and expand it into a detailed, visually compelling description that would guide a state-of-the-art AI video generator.

When enhancing prompts, consider:
1. Camera work: angles, movements (pan, tilt, zoom, tracking shots)
2. Lighting: natural, artificial, dramatic, soft, golden hour
3. Environment and setting details
4. Subject actions and movements
5. Color palette and visual mood
6. Temporal progression within the scene

Keep your response focused on visual description only. Do not include dialogue, sound effects, or music descriptions. Output only the enhanced prompt, nothing else."""

I2V_SYSTEM_PROMPT = """You are a highly skilled video production expert. Given an image and a user prompt, create a detailed video description that:
1. Accurately describes the key visual elements in the image
2. Incorporates the user's requested action or scene development
3. Adds cinematic details like camera movement, lighting changes, and temporal progression

Describe the video as a continuous scene starting from the provided image. Focus on visual elements only - no dialogue, sound effects, or music. Output only the enhanced prompt, nothing else."""


def clean_response(response: str) -> str:
    """Strip curly quotes, leading markers, and whitespace."""
    response = response.replace("“", '"').replace("”", '"')
    response = response.replace("‘", "'").replace("’", "'")
    response = response.lstrip("-*:> ")
    return response.strip()


def resize_aspect_ratio_preserving(image: np.ndarray, long_side: int) -> np.ndarray:
    """Resize (H, W, C) image so its long side equals `long_side`."""
    from PIL import Image

    h, w = image.shape[:2]
    if h >= w:
        new_h, new_w = long_side, max(1, round(w * long_side / h))
    else:
        new_h, new_w = max(1, round(h * long_side / w)), long_side
    img = Image.fromarray(image.astype(np.uint8))
    return np.asarray(img.resize((new_w, new_h), Image.Resampling.LANCZOS))


def build_chat_prompt(system_prompt: str, user_prompt: str) -> str:
    """Gemma-3 turn format for the enhancement conversation."""
    return (
        f"<start_of_turn>user\n{system_prompt}\n\n{user_prompt}<end_of_turn>\n"
        f"<start_of_turn>model\n"
    )


def enhance_prompt(
    prompt: str,
    generate_fn: Callable[[str, int], str],
    system_prompt: str = T2V_SYSTEM_PROMPT,
    max_tokens: int = 512,
) -> str:
    """Enhance a user prompt via a text-generation callable.

    generate_fn(full_prompt, max_tokens) -> generated text. Decoupled from
    the Gemma runtime so the CLI can plug in the loaded model (or skip
    enhancement entirely for QAT checkpoints).
    """
    full = build_chat_prompt(system_prompt, prompt)
    response = generate_fn(full, max_tokens)
    cleaned = clean_response(response)
    return cleaned if cleaned else prompt


def create_i2v_chat_prompt(user_prompt: str, system_prompt: str = None) -> str:
    """I2V chat prompt (reference prompt_enhancement.py:101-115). Text-only:
    the reference's Gemma-3 text model cannot consume the image, so the
    conversation carries an `[Image provided]` marker instead — the image
    itself conditions generation through the VAE path, not the LLM."""
    system_prompt = system_prompt or I2V_SYSTEM_PROMPT
    # Deliberate divergence (review r4, rule of docs/PARITY.md): the
    # reference hardcodes '<bos>' here AND tokenizes with the default
    # add_special_tokens=True (prompt_enhancement.py:107,209), feeding
    # Gemma a double BOS the model never saw in training — its own T2V
    # builder has no literal '<bos>'. The tokenizer adds the single BOS.
    return (
        f"<start_of_turn>user\n"
        f"{system_prompt}\n\n"
        f"[Image provided]\n"
        f"User prompt: {user_prompt}<end_of_turn>\n"
        f"<start_of_turn>model\n"
    )


def enhance_prompt_i2v(
    user_prompt: str,
    image_path: str,
    generate_fn: Callable[..., str],
    max_tokens: int = 256,
    system_prompt: str = None,
) -> str:
    """Image-to-video prompt enhancement (reference
    prompt_enhancement.py:175-237): I2V system prompt + `[Image provided]`
    marker, nucleus sampling at temperature 0.7 / top_p 0.9.

    generate_fn(full_prompt, max_tokens, temperature=..., top_p=...) -> text.
    image_path is accepted for surface parity; like the reference, the
    text-only Gemma never sees the pixels (see create_i2v_chat_prompt).
    """
    full = create_i2v_chat_prompt(user_prompt, system_prompt)
    response = generate_fn(full, max_tokens, temperature=0.7, top_p=0.9)
    if "<start_of_turn>model" in response:
        response = response.split("<start_of_turn>model")[-1]
    cleaned = clean_response(response)
    return cleaned if cleaned else user_prompt
