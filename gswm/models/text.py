"""CLIP text encoder (prompt conditioning).

The reference gets text embeddings through diffusers' CLIPTextModel inside
StableDiffusionPipeline (extract.py:56-69 — inversion runs with the empty
prompt, guidance 1.0).  Here we wrap transformers' FlaxCLIPTextModel (pure
JAX) configured from our presets; tokenization needs vocab files from a local
checkpoint directory (offline environments pass token ids directly — the
inversion path only ever needs the empty-prompt ids, which are just
[BOS, EOS, PAD...] and are synthesized without a tokenizer).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gswm.models.configs import TextConfig

BOS_ID = 49406
EOS_ID = 49407


@functools.lru_cache(maxsize=4)
def _build_flax_clip(cfg: TextConfig):
    from transformers import CLIPTextConfig, FlaxCLIPTextModel

    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.hidden_size * 4,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_length,
        hidden_act=cfg.hidden_act,
        # pooling finds the EOS position by token id — must match the ids
        # empty_prompt_ids synthesizes (tiny test vocabs clamp EOS)
        bos_token_id=min(BOS_ID, cfg.vocab_size - 2),
        eos_token_id=min(EOS_ID, cfg.vocab_size - 1),
    )
    return FlaxCLIPTextModel(hf_cfg, _do_init=True)


class TextEncoder:
    """Thin functional wrapper: (params, input_ids) -> (B, 77, hidden)."""

    def __init__(self, cfg: TextConfig):
        self.cfg = cfg
        self.model = _build_flax_clip(cfg)
        self.params = self.model.params

    def __call__(self, input_ids, params=None):
        out = self.model(
            input_ids=input_ids,
            params=params if params is not None else self.params,
            output_hidden_states=self.cfg.penultimate,
        )
        if self.cfg.penultimate:
            # SD2.x conditions on the penultimate hidden state with the final
            # layer norm applied (diffusers clip-skip semantics).
            hidden = out.hidden_states[-2]
            ln = self.model.params["text_model"]["final_layer_norm"]
            mean = hidden.mean(-1, keepdims=True)
            var = ((hidden - mean) ** 2).mean(-1, keepdims=True)
            hidden = (hidden - mean) / jnp.sqrt(var + 1e-5)
            return hidden * ln["scale"] + ln["bias"]
        return out.last_hidden_state

    def pooled(self, input_ids, params=None, projection=None) -> jnp.ndarray:
        """(B, 77) ids -> (B, hidden) pooled embedding: the EOS-position
        hidden state after the final layer norm (CLIP pooling), optionally
        through a text_projection matrix (SDXL's second encoder is a
        CLIPTextModelWithProjection — the pooled output that feeds
        added_cond.text_embeds goes through that projection when real
        checkpoint weights supply one)."""
        out = self.model(
            input_ids=input_ids,
            params=params if params is not None else self.params,
        )
        pooled = out.pooler_output
        if projection is not None:
            pooled = pooled @ jnp.asarray(projection)
        return pooled

    def empty_prompt_ids(self, batch: int = 1) -> np.ndarray:
        """Token ids for "" — BOS then EOS-padding (CLIP pads with EOS)."""
        bos = min(BOS_ID, self.cfg.vocab_size - 2)
        eos = min(EOS_ID, self.cfg.vocab_size - 1)
        ids = np.full((batch, self.cfg.max_length), eos, dtype=np.int32)
        ids[:, 0] = bos
        return ids


def load_tokenizer(model_dir: str):
    """CLIPTokenizer from a local checkpoint directory (needs vocab.json +
    merges.txt; unavailable offline — callers fall back to raw ids)."""
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(model_dir, local_files_only=True)
