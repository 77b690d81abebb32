"""LDM-BERT converter + Flax encoder parity vs an independent torch replica.

Covers the reference converter's LDM-BERT branch (reference
`change_model_path.py:742-792`): the x-transformers interleaved
[norm, attn]/[norm, ff] slot layout, biasless q/k/v, the decoupled attention
inner dim (heads·head_dim ≠ d_model), and the unused-but-present ``to_logits``
head. The torch replica below is written from the copy-loop semantics, not
from any model source, so the Flax module and the replica are independent
derivations of the same spec.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pww_tpu.config import LDMBertConfig
from pww_tpu.models.ldm_bert import LDMBertEncoder
from pww_tpu.weights.ldm_convert import (
    convert_ldm_bert,
    is_ldm_bert_sd,
    ldm_bert_key,
)

torch = pytest.importorskip("torch")

CFG = LDMBertConfig.tiny()  # d_model 32, 2 layers, 2 heads × 8 (inner 16)


def _synth_state(cfg: LDMBertConfig, seed: int = 0):
    """Random original-LDM state dict (``cond_stage_model.transformer.``
    stripped), x-transformers naming as walked by the reference's
    ``convert_ldm_bert_checkpoint`` attribute accesses."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.08

    sd = {
        "token_emb.weight": r(cfg.vocab_size, cfg.d_model),
        "pos_emb.emb.weight": r(cfg.max_position_embeddings, cfg.d_model),
        "norm.weight": 1 + 0.1 * r(cfg.d_model),
        "norm.bias": 0.1 * r(cfg.d_model),
        "to_logits.weight": r(cfg.vocab_size, cfg.d_model),
        "to_logits.bias": 0.1 * r(cfg.vocab_size),
    }
    inner = cfg.inner_dim
    for i in range(cfg.num_layers):
        a, f = 2 * i, 2 * i + 1  # attention / feed-forward slots
        sd[f"attn_layers.layers.{a}.0.weight"] = 1 + 0.1 * r(cfg.d_model)
        sd[f"attn_layers.layers.{a}.0.bias"] = 0.1 * r(cfg.d_model)
        for p in ("to_q", "to_k", "to_v"):
            sd[f"attn_layers.layers.{a}.1.{p}.weight"] = r(inner, cfg.d_model)
        sd[f"attn_layers.layers.{a}.1.to_out.weight"] = r(cfg.d_model, inner)
        sd[f"attn_layers.layers.{a}.1.to_out.bias"] = 0.1 * r(cfg.d_model)
        sd[f"attn_layers.layers.{f}.0.weight"] = 1 + 0.1 * r(cfg.d_model)
        sd[f"attn_layers.layers.{f}.0.bias"] = 0.1 * r(cfg.d_model)
        sd[f"attn_layers.layers.{f}.1.net.0.0.weight"] = r(cfg.ffn_dim, cfg.d_model)
        sd[f"attn_layers.layers.{f}.1.net.0.0.bias"] = 0.1 * r(cfg.ffn_dim)
        sd[f"attn_layers.layers.{f}.1.net.2.weight"] = r(cfg.d_model, cfg.ffn_dim)
        sd[f"attn_layers.layers.{f}.1.net.2.bias"] = 0.1 * r(cfg.d_model)
    return {k: v.numpy() for k, v in sd.items()}


def _torch_forward(sd, ids, cfg: LDMBertConfig):
    """Independent torch re-derivation of the LDM-BERT forward: summed
    token+position embeddings (no embedding norm), pre-LN bidirectional
    attention with scale head_dim**-0.5, exact-erf GELU MLP, final LayerNorm,
    then the ``to_logits`` head."""
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = t["token_emb.weight"][torch.from_numpy(ids)]
    x = x + t["pos_emb.emb.weight"][: ids.shape[-1]][None]
    b, length, d = x.shape
    h_, dh = cfg.num_heads, cfg.head_dim
    for i in range(cfg.num_layers):
        a, f = 2 * i, 2 * i + 1
        h = F.layer_norm(
            x, (d,), t[f"attn_layers.layers.{a}.0.weight"],
            t[f"attn_layers.layers.{a}.0.bias"], cfg.layer_norm_eps,
        )
        q = h @ t[f"attn_layers.layers.{a}.1.to_q.weight"].T
        k = h @ t[f"attn_layers.layers.{a}.1.to_k.weight"].T
        v = h @ t[f"attn_layers.layers.{a}.1.to_v.weight"].T
        q, k, v = (
            z.view(b, length, h_, dh).transpose(1, 2) for z in (q, k, v)
        )
        p = F.softmax(q @ k.transpose(-1, -2) / math.sqrt(dh), dim=-1)
        o = (p @ v).transpose(1, 2).reshape(b, length, h_ * dh)
        x = x + (
            o @ t[f"attn_layers.layers.{a}.1.to_out.weight"].T
            + t[f"attn_layers.layers.{a}.1.to_out.bias"]
        )
        h = F.layer_norm(
            x, (d,), t[f"attn_layers.layers.{f}.0.weight"],
            t[f"attn_layers.layers.{f}.0.bias"], cfg.layer_norm_eps,
        )
        h = F.gelu(
            h @ t[f"attn_layers.layers.{f}.1.net.0.0.weight"].T
            + t[f"attn_layers.layers.{f}.1.net.0.0.bias"]
        )
        x = x + (
            h @ t[f"attn_layers.layers.{f}.1.net.2.weight"].T
            + t[f"attn_layers.layers.{f}.1.net.2.bias"]
        )
    x = F.layer_norm(
        x, (d,), t["norm.weight"], t["norm.bias"], cfg.layer_norm_eps
    )
    logits = x @ t["to_logits.weight"].T + t["to_logits.bias"]
    return x.numpy(), logits.numpy()


def test_flax_matches_torch_replica():
    sd = _synth_state(CFG)
    config, params = convert_ldm_bert(sd, num_heads=CFG.num_heads)
    assert config == CFG  # every hyperparameter inferred from shapes
    ids = np.array(
        [[1, 5, 9, 2, 0, 0, 7, 3, 42, 99, 4, 4, 8, 6, 2, 1],
         [3, 3, 1, 0, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22]],
        np.int32,
    )
    want_h, want_logits = _torch_forward(sd, ids, CFG)
    got_h, got_logits = LDMBertEncoder(config).apply(
        params, jnp.asarray(ids), return_logits=True
    )
    np.testing.assert_allclose(np.asarray(got_h), want_h, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_logits), want_logits, atol=1e-4, rtol=1e-4
    )


def test_head_split_inference():
    # inner dim 16 with no overrides: not divisible by 64 → 8-head fallback
    sd = _synth_state(CFG)
    config, _ = convert_ldm_bert(sd)
    assert config.num_heads * config.head_dim == CFG.inner_dim
    assert config.num_heads == 8 and config.head_dim == 2
    with pytest.raises(ValueError, match="inner dim"):
        convert_ldm_bert(sd, num_heads=3, head_dim=3)


@pytest.mark.parametrize(
    "path,want",
    [
        (("embed_tokens", "embedding"), "token_emb.weight"),
        (("embed_positions", "embedding"), "pos_emb.emb.weight"),
        (("layers_0", "self_attn_layer_norm", "scale"),
         "attn_layers.layers.0.0.weight"),
        (("layers_1", "self_attn", "q_proj", "kernel"),
         "attn_layers.layers.2.1.to_q.weight"),
        (("layers_1", "self_attn", "out_proj", "bias"),
         "attn_layers.layers.2.1.to_out.bias"),
        (("layers_0", "final_layer_norm", "bias"),
         "attn_layers.layers.1.0.bias"),
        (("layers_2", "fc1", "kernel"),
         "attn_layers.layers.5.1.net.0.0.weight"),
        (("layers_2", "fc2", "bias"), "attn_layers.layers.5.1.net.2.bias"),
        (("layer_norm", "scale"), "norm.weight"),
        (("to_logits", "kernel"), "to_logits.weight"),
    ],
)
def test_key_mapping(path, want):
    rank = 2 if path[-1] in ("kernel", "embedding") else 1
    assert ldm_bert_key(path, rank)[0] == want


def test_cli_text_encoder_only_dump(tmp_path, monkeypatch):
    # The converter CLI can dump just the BERT tower of an original-LDM
    # checkpoint (its UNet/VAE are not PwW-runnable), and the dumped params
    # round-trip through flax serialization.
    import json

    import flax.serialization

    from pww_tpu.weights.ldm_convert import _cli

    sd = _synth_state(CFG)
    full = {f"cond_stage_model.transformer.{k}": torch.from_numpy(v)
            for k, v in sd.items()}
    ckpt = tmp_path / "ldm.ckpt"
    torch.save({"state_dict": full}, ckpt)
    out = tmp_path / "out"
    monkeypatch.setattr(
        "sys.argv",
        ["ldm_convert", "--checkpoint_path", str(ckpt),
         "--dump_path", str(out), "--text_encoder_only"],
    )
    _cli()
    meta = json.loads((out / "config.json").read_text())
    assert meta["ldm_bert"]["d_model"] == CFG.d_model
    assert meta["ldm_bert"]["num_layers"] == CFG.num_layers
    _, params = convert_ldm_bert(sd)  # head split doesn't affect params
    restored = flax.serialization.from_bytes(
        params, (out / "params.msgpack").read_bytes()
    )
    got = restored["params"]["embed_tokens"]["embedding"]
    np.testing.assert_array_equal(np.asarray(got), sd["token_emb.weight"])


def test_cli_text_encoder_only_rejects_clip(tmp_path, monkeypatch):
    full = {
        "cond_stage_model.transformer.text_model.embeddings."
        "token_embedding.weight": torch.zeros(10, 8)
    }
    ckpt = tmp_path / "sd.ckpt"
    torch.save({"state_dict": full}, ckpt)
    from pww_tpu.weights.ldm_convert import _cli

    monkeypatch.setattr(
        "sys.argv",
        ["ldm_convert", "--checkpoint_path", str(ckpt),
         "--dump_path", str(tmp_path / "o"), "--text_encoder_only"],
    )
    with pytest.raises(SystemExit):
        _cli()


def test_detection_and_loader_refusal(tmp_path):
    # An LDM-BERT tower is detected, and the full-pipeline loader refuses it
    # with the CLIP-scope explanation instead of mis-mapping keys into CLIP.
    sd = _synth_state(CFG)
    assert is_ldm_bert_sd(sd)
    assert not is_ldm_bert_sd({"text_model.embeddings.token_embedding.weight": 0})

    from pww_tpu.weights.ldm_convert import load_ldm_checkpoint

    full = {f"cond_stage_model.transformer.{k}": torch.from_numpy(v)
            for k, v in sd.items()}
    # minimal extra keys so the splitter runs; loader must refuse before
    # touching unet/vae
    ckpt = tmp_path / "ldm_bert.ckpt"
    torch.save({"state_dict": full}, ckpt)
    with pytest.raises(ValueError, match="LDM-BERT"):
        load_ldm_checkpoint(str(ckpt))
