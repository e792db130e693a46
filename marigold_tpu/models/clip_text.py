"""CLIP text encoder (transformers CLIPTextModel role) — functional JAX.

Role parity: the reference instantiates CLIPTextModel/CLIPTokenizer only to
embed the **empty prompt** once per pipeline call
(marigold_depth_pipeline.py:381-394): tokenized with do_not_pad, the empty
string is just [BOS, EOS] -> a [1, 2, 1024] embedding reused for every batch
element. We implement the full text tower (needed to consume SD2-format
checkpoints and for arbitrary prompts) plus the fast empty-prompt path.

SD2's tower is the OpenCLIP ViT-H text model: hidden 1024, 23 layers,
16 heads, GELU, causal mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from marigold_tpu.models import layers as L

BOS_TOKEN_ID = 49406
EOS_TOKEN_ID = 49407


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    bos_token_id: int = BOS_TOKEN_ID
    eos_token_id: int = EOS_TOKEN_ID

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CLIPTextConfig":
        return cls(
            vocab_size=d.get("vocab_size", 49408),
            hidden_size=d.get("hidden_size", 1024),
            intermediate_size=d.get("intermediate_size", 4096),
            num_hidden_layers=d.get("num_hidden_layers", 23),
            num_attention_heads=d.get("num_attention_heads", 16),
            max_position_embeddings=d.get("max_position_embeddings", 77),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            hidden_act=d.get("hidden_act", "gelu"),
            bos_token_id=d.get("bos_token_id", BOS_TOKEN_ID),
            eos_token_id=d.get("eos_token_id", EOS_TOKEN_ID),
        )

    def to_dict(self) -> dict:
        return {
            "architectures": ["CLIPTextModel"],
            "vocab_size": self.vocab_size,
            "hidden_size": self.hidden_size,
            "intermediate_size": self.intermediate_size,
            "num_hidden_layers": self.num_hidden_layers,
            "num_attention_heads": self.num_attention_heads,
            "max_position_embeddings": self.max_position_embeddings,
            "layer_norm_eps": self.layer_norm_eps,
            "hidden_act": self.hidden_act,
            "bos_token_id": self.bos_token_id,
            "eos_token_id": self.eos_token_id,
        }


def init_params(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> dict:
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_hidden_layers))
    params = {
        "embeddings": {
            "token_embedding": {
                "weight": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype)
                * 0.02
            },
            "position_embedding": {
                "weight": jax.random.normal(
                    next(keys), (cfg.max_position_embeddings, h), dtype
                )
                * 0.02
            },
        },
        "encoder": {"layers": {}},
        "final_layer_norm": L.init_norm(h, dtype),
    }
    for i in range(cfg.num_hidden_layers):
        params["encoder"]["layers"][str(i)] = {
            "layer_norm1": L.init_norm(h, dtype),
            "self_attn": {
                "q_proj": L.init_linear(next(keys), h, h, dtype),
                "k_proj": L.init_linear(next(keys), h, h, dtype),
                "v_proj": L.init_linear(next(keys), h, h, dtype),
                "out_proj": L.init_linear(next(keys), h, h, dtype),
            },
            "layer_norm2": L.init_norm(h, dtype),
            "mlp": {
                "fc1": L.init_linear(next(keys), h, cfg.intermediate_size, dtype),
                "fc2": L.init_linear(next(keys), cfg.intermediate_size, h, dtype),
            },
        }
    return params


def _act(x, name):
    xf = x.astype(jnp.float32)
    if name == "gelu":
        y = jax.nn.gelu(xf, approximate=False)
    elif name == "quick_gelu":
        y = xf * jax.nn.sigmoid(1.702 * xf)
    else:
        raise ValueError(f"unknown act: {name}")
    return y.astype(x.dtype)


def apply(params: dict, cfg: CLIPTextConfig, input_ids: jax.Array) -> jax.Array:
    """input_ids: [B, L] int32 -> last_hidden_state [B, L, hidden]."""
    b, n = input_ids.shape
    emb = params["embeddings"]
    x = jnp.take(emb["token_embedding"]["weight"], input_ids, axis=0)
    x = x + emb["position_embedding"]["weight"][:n]

    # causal mask
    causal = jnp.where(
        jnp.tril(jnp.ones((n, n), bool)), 0.0, jnp.asarray(-1e30, jnp.float32)
    )[None, None]

    for i in range(cfg.num_hidden_layers):
        lyr = params["encoder"]["layers"][str(i)]
        res = x
        y = L.layer_norm(lyr["layer_norm1"], x, cfg.layer_norm_eps)
        sa = lyr["self_attn"]
        q = L.linear(sa["q_proj"], y)
        k = L.linear(sa["k_proj"], y)
        v = L.linear(sa["v_proj"], y)
        y = L.attention(q, k, v, cfg.num_attention_heads, mask=causal)
        x = res + L.linear(sa["out_proj"], y)

        res = x
        y = L.layer_norm(lyr["layer_norm2"], x, cfg.layer_norm_eps)
        y = L.linear(lyr["mlp"]["fc1"], y)
        y = _act(y, cfg.hidden_act)
        x = res + L.linear(lyr["mlp"]["fc2"], y)

    return L.layer_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)


def encode_empty_prompt(params: dict, cfg: CLIPTextConfig) -> jax.Array:
    """The Marigold conditioning: embed "" == [BOS, EOS] (do_not_pad) ->
    [1, 2, hidden]. Computed once and broadcast per batch
    (reference marigold_depth_pipeline.py:381-394, 438-442)."""
    ids = jnp.asarray([[cfg.bos_token_id, cfg.eos_token_id]], jnp.int32)
    return apply(params, cfg, ids)
