"""CLIP text encoder for the SD-family pipelines (the reference uses
transformers' CLIPTextModel, trainers/sd_text_trainer.py:13,110-115; here
the Flax variant from the same library). Zero-egress: weights initialize
randomly from the ViT-L/14 text config unless a local checkpoint is
provided; the tokenizer falls back to a deterministic hash tokenizer so the
pipelines stay runnable without vocab files."""

from typing import Optional

import numpy as np
import jax.numpy as jnp


CLIP_VIT_L_TEXT_CONFIG = dict(
    vocab_size=49408, hidden_size=768, intermediate_size=3072,
    num_hidden_layers=12, num_attention_heads=12,
    max_position_embeddings=77, hidden_act="quick_gelu",
    layer_norm_eps=1e-5, projection_dim=768,
)


class TextEncoder:
    def __init__(self, pretrained_dir: Optional[str] = None, seed: int = 0,
                 dtype=jnp.float32, tokenizer_dir: Optional[str] = None):
        # diffusers pipeline layout keeps vocab/merges in a sibling
        # tokenizer/ subfolder, not next to the text-model weights
        tokenizer_dir = tokenizer_dir or pretrained_dir
        from transformers import CLIPTextConfig, FlaxCLIPTextModel
        if pretrained_dir:
            try:
                self.model = FlaxCLIPTextModel.from_pretrained(
                    pretrained_dir, dtype=dtype)
            except (OSError, EnvironmentError):
                # local dir holds torch weights only (the reference SD
                # checkpoints ship pytorch_model.bin) — convert on load
                self.model = FlaxCLIPTextModel.from_pretrained(
                    pretrained_dir, dtype=dtype, from_pt=True)
        else:
            cfg = CLIPTextConfig(**CLIP_VIT_L_TEXT_CONFIG)
            self.model = FlaxCLIPTextModel(cfg, seed=seed, dtype=dtype)
        self.max_length = self.model.config.max_position_embeddings
        self._tokenizer = None
        if tokenizer_dir:
            try:
                from transformers import CLIPTokenizer
                self._tokenizer = CLIPTokenizer.from_pretrained(
                    tokenizer_dir)
            except Exception:
                self._tokenizer = None

    def tokenize(self, prompts):
        if isinstance(prompts, str):
            prompts = [prompts]
        if self._tokenizer is not None:
            out = self._tokenizer(prompts, padding="max_length",
                                  max_length=self.max_length,
                                  truncation=True, return_tensors="np")
            return out["input_ids"]
        # deterministic fallback: hash words to token ids (structure-only;
        # semantics require the real vocab). crc32, NOT hash(): python's
        # hash is salted per process (PYTHONHASHSEED), which would make
        # the same prompt tokenize differently across runs
        import zlib
        ids = np.full((len(prompts), self.max_length), 49407, np.int32)
        for i, p in enumerate(prompts):
            ids[i, 0] = 49406  # BOS
            for j, w in enumerate(p.lower().split()[: self.max_length - 2]):
                ids[i, j + 1] = (zlib.crc32(w.encode()) % 49000) + 300
        return ids

    def encode(self, prompts):
        """prompts (list of str or token ids) -> (N, 77, hidden) states."""
        if isinstance(prompts, (list, str)):
            input_ids = self.tokenize(prompts)
        else:
            input_ids = np.asarray(prompts)
        out = self.model(input_ids=jnp.asarray(input_ids))
        return out.last_hidden_state
