"""Legacy model components from the reference's experimental variants.

TPU-native equivalents of the auxiliary modules in
`/root/reference/whisper/model_all.py` and `model_tmp.py`:

- :func:`resnet1d_apply` — 1-D conv ResNet over token embeddings
  (model_all.py:198-223; conv-BN-ReLU-conv-BN residual blocks);
- :func:`reprogramming_apply` — cross-attention that re-programs Whisper
  token embeddings into an LLM (BERT) embedding space; covers both the
  shared-source ``_m1`` (source (S, D)) and batched ``_m2`` (source
  (B, S, D)) variants (model_all.py:225-301);
- AdaKWS keyword spotter (model_tmp.py:352-467): char-LSTM keyword
  encoder producing AdaIN statistics, two keyword-adaptive transformer
  blocks over audio features, max-pool + binary classifier per keyword.
  The LSTM runs as a ``lax.scan``; keywords fold into the batch axis.

The two-stream sequential/parallel gated-x-attn fusion from model_all /
model_ada is supported in the main model via
``ModelExtras.sequential_gated_x_attn`` (models/whisper.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.attention import qkv_attention
from .whisper import Params, linear

# ---------------------------------------------------------------------------
# ResNet1D over embeddings (model_all.py:198-223)
# ---------------------------------------------------------------------------

def _bn1d(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    xf = x.astype(jnp.float32)
    return ((xf - p["mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)


def _conv1d_same(p: Params, x: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["b"].astype(x.dtype)


def resnet1d_apply(params: Params, x: jax.Array) -> jax.Array:
    """(B, T, D) -> (B, T, D) through conv-BN-ReLU-conv-BN residual blocks."""
    for blk in params["layers"]:
        identity = x
        out = _conv1d_same(blk["conv1"], x)
        out = jax.nn.relu(_bn1d(blk["bn1"], out))
        out = _conv1d_same(blk["conv2"], out)
        out = _bn1d(blk["bn2"], out)
        x = jax.nn.relu(out + identity)
    return x


def init_resnet1d(key, input_dim: int, hidden_dim: int, num_layers: int) -> Params:
    def conv(key, din, dout):
        return {
            "w": jax.random.normal(key, (3, din, dout), jnp.float32)
            / math.sqrt(3 * din),
            "b": jnp.zeros((dout,), jnp.float32),
        }

    def bn(d):
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,)),
                "mean": jnp.zeros((d,)), "var": jnp.ones((d,))}

    keys = jax.random.split(key, 2 * num_layers)
    return {
        "layers": [
            {
                "conv1": conv(keys[2 * i], input_dim, hidden_dim),
                "bn1": bn(hidden_dim),
                "conv2": conv(keys[2 * i + 1], hidden_dim, input_dim),
                "bn2": bn(input_dim),
            }
            for i in range(num_layers)
        ]
    }


# ---------------------------------------------------------------------------
# Reprogramming layer (model_all.py:225-301)
# ---------------------------------------------------------------------------

def reprogramming_apply(
    params: Params, target: jax.Array, source: jax.Array, value: jax.Array,
    n_heads: int,
) -> jax.Array:
    """Cross-attend target (B, L, d_model) into an embedding space.

    ``source``/``value``: (S, d_llm) shared across the batch (the _m1
    variant) or (B, S, d_llm) batched (_m2). Returns (B, L, d_llm).
    """
    B, L, _ = target.shape
    q = linear(params["q"], target).reshape(B, L, n_heads, -1)
    if source.ndim == 2:
        k = linear(params["k"], source).reshape(source.shape[0], n_heads, -1)
        v = linear(params["v"], value).reshape(value.shape[0], n_heads, -1)
        scale = 1.0 / math.sqrt(q.shape[-1])
        scores = jnp.einsum("blhd,shd->bhls", q, k) * scale
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhls,shd->blhd", weights, v)
    else:
        k = linear(params["k"], source).reshape(B, source.shape[1], n_heads, -1)
        v = linear(params["v"], value).reshape(B, value.shape[1], n_heads, -1)
        scale = 1.0 / math.sqrt(q.shape[-1])
        scores = jnp.einsum("blhd,bshd->bhls", q, k) * scale
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhls,bshd->blhd", weights, v)
    return linear(params["out"], out.reshape(B, L, -1))


def init_reprogramming(key, d_model: int, n_heads: int, d_keys=None, d_llm=None) -> Params:
    d_keys = d_keys or (d_model // n_heads)
    d_llm = d_llm or d_model
    ks = jax.random.split(key, 4)

    def lin(key, din, dout):
        return {"w": jax.random.normal(key, (din, dout), jnp.float32) / math.sqrt(din),
                "b": jnp.zeros((dout,), jnp.float32)}

    return {
        "q": lin(ks[0], d_model, d_keys * n_heads),
        "k": lin(ks[1], d_llm, d_keys * n_heads),
        "v": lin(ks[2], d_llm, d_keys * n_heads),
        "out": lin(ks[3], d_keys * n_heads, d_llm),
    }


# ---------------------------------------------------------------------------
# AdaKWS keyword spotter (model_tmp.py:352-467)
# ---------------------------------------------------------------------------

def _lstm_layer(p: Params, xs: jax.Array) -> jax.Array:
    """Single LSTM layer over (B, T, D_in) -> outputs (B, T, H), final h."""
    B = xs.shape[0]
    H = p["w_hh"].shape[0]

    def step(carry, x_t):
        h, c = carry
        gates = x_t @ p["w_ih"] + h @ p["w_hh"] + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), xs.dtype), jnp.zeros((B, H), xs.dtype))
    (h_final, _), outs = jax.lax.scan(step, init, xs.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2), h_final


def adain(z: jax.Array, mu_v: jax.Array, sigma_v: jax.Array, eps: float = 1e-5):
    """Adaptive instance norm over time (model_tmp.py:384-397)."""
    mu_z = jnp.mean(z, axis=1, keepdims=True)
    sigma_z = jnp.sqrt(jnp.var(z, axis=1, keepdims=True)) + eps
    return sigma_v * ((z - mu_z) / sigma_z) + mu_v


def _kw_module_apply(p: Params, x: jax.Array, mu_v, sigma_v, n_heads: int = 8):
    x_norm = adain(x, mu_v, sigma_v)
    q = linear(p["q"], x_norm)
    k = linear(p["k"], x_norm)
    v = linear(p["v"], x_norm)
    attn = qkv_attention(q, k, v, n_heads)
    x = x + linear(p["out"], attn)
    x_norm = adain(x, mu_v, sigma_v)
    x = x + linear(p["fc2"], jax.nn.relu(linear(p["fc1"], x_norm)))
    return x


def adakws_apply(params: Params, audio_features: jax.Array, keyword_tokens: jax.Array):
    """audio (B, T, D) + keywords (B, K, L) char ids -> logits (B, K, 2)."""
    B, T, D = audio_features.shape
    _, K, L = keyword_tokens.shape

    # char-LSTM keyword encoder -> per-keyword AdaIN statistics
    emb = params["embedding"][keyword_tokens.reshape(B * K, L)]
    h = emb
    for layer_p in params["lstm"]:
        h, h_final = _lstm_layer(layer_p, h)
    mu_v = linear(params["fc_mu"], h_final)  # (B*K, D)
    sigma_v = linear(params["fc_sigma"], h_final)

    # fold keywords into batch, run two keyword-adaptive blocks
    z = jnp.broadcast_to(audio_features[:, None], (B, K, T, D)).reshape(B * K, T, D)
    z = _kw_module_apply(params["kw1"], z, mu_v[:, None], sigma_v[:, None])
    z = _kw_module_apply(params["kw2"], z, mu_v[:, None], sigma_v[:, None])

    z_pooled = jnp.max(z, axis=1)  # (B*K, D)
    logits = linear(params["classifier"], z_pooled)
    return logits.reshape(B, K, 2)


def load_adakws_torch(state, vocab_size: int, **kw) -> Params:
    """Import a torch AdaKWS checkpoint (reference model_tmp.py:469-510
    loads these onto ``Whisper.keyword_spotter``). Key map: embedding,
    lstm.weight_ih/hh_l{k}, fc_mu/fc_sigma, kw_module{1,2}.{self_attn
    (in_proj/out_proj), fc1, fc2}, classifier."""
    import numpy as np

    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    import jax

    params = jax.tree.map(np.asarray, init_adakws(jax.random.PRNGKey(0), vocab_size, **kw))
    p = {k.split("text_encoder.", 1)[-1] if "text_encoder." in k else k: v
         for k, v in state.items()}
    if "embedding.weight" in p:
        params["embedding"] = t(p["embedding.weight"])
    for k in range(len(params["lstm"])):
        if f"lstm.weight_ih_l{k}" in p:
            params["lstm"][k]["w_ih"] = t(p[f"lstm.weight_ih_l{k}"]).T
            params["lstm"][k]["w_hh"] = t(p[f"lstm.weight_hh_l{k}"]).T
            params["lstm"][k]["b"] = t(p[f"lstm.bias_ih_l{k}"]) + t(p[f"lstm.bias_hh_l{k}"])
    for name in ("fc_mu", "fc_sigma", "classifier"):
        if f"{name}.weight" in p:
            params[name]["w"] = t(p[f"{name}.weight"]).T
            params[name]["b"] = t(p[f"{name}.bias"])
    for mod, ours in (("kw_module1", "kw1"), ("kw_module2", "kw2")):
        key_w = f"{mod}.self_attn.in_proj_weight"
        if key_w in p:
            w = t(p[key_w])  # (3D, D) packed q,k,v
            b = t(p[f"{mod}.self_attn.in_proj_bias"])
            d = w.shape[1]
            for i, proj in enumerate(("q", "k", "v")):
                params[ours][proj]["w"] = w[i * d : (i + 1) * d].T
                params[ours][proj]["b"] = b[i * d : (i + 1) * d]
            params[ours]["out"]["w"] = t(p[f"{mod}.self_attn.out_proj.weight"]).T
            params[ours]["out"]["b"] = t(p[f"{mod}.self_attn.out_proj.bias"])
        for fc in ("fc1", "fc2"):
            if f"{mod}.{fc}.weight" in p:
                params[ours][fc]["w"] = t(p[f"{mod}.{fc}.weight"]).T
                params[ours][fc]["b"] = t(p[f"{mod}.{fc}.bias"])
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def init_adakws(key, vocab_size: int, d_model: int = 768,
                embed_dim: int = 128, hidden_dim: int = 256,
                num_lstm_layers: int = 4, dim_ff: int = 2048) -> Params:
    ks = jax.random.split(key, 16)

    def lin(key, din, dout):
        return {"w": jax.random.normal(key, (din, dout), jnp.float32) / math.sqrt(din),
                "b": jnp.zeros((dout,), jnp.float32)}

    def lstm(key, din, h):
        k1, k2 = jax.random.split(key)
        return {
            "w_ih": jax.random.normal(k1, (din, 4 * h), jnp.float32) / math.sqrt(din),
            "w_hh": jax.random.normal(k2, (h, 4 * h), jnp.float32) / math.sqrt(h),
            "b": jnp.zeros((4 * h,), jnp.float32),
        }

    def kw(key):
        kk = jax.random.split(key, 6)
        return {
            "q": lin(kk[0], d_model, d_model), "k": lin(kk[1], d_model, d_model),
            "v": lin(kk[2], d_model, d_model), "out": lin(kk[3], d_model, d_model),
            "fc1": lin(kk[4], d_model, dim_ff), "fc2": lin(kk[5], dim_ff, d_model),
        }

    return {
        "embedding": jax.random.normal(ks[0], (vocab_size, embed_dim), jnp.float32),
        "lstm": [
            lstm(ks[1 + i], embed_dim if i == 0 else hidden_dim, hidden_dim)
            for i in range(num_lstm_layers)
        ],
        "fc_mu": lin(ks[6], hidden_dim, d_model),
        "fc_sigma": lin(ks[7], hidden_dim, d_model),
        "kw1": kw(ks[8]),
        "kw2": kw(ks[9]),
        "classifier": lin(ks[10], d_model, 2),
    }
