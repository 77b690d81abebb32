"""LoRA loading/merging tests (kohya + diffusers/peft formats).

Beyond-the-reference capability (the reference has no LoRA support); merge
math is checked against an independent dense computation, and the kohya key
construction is derived from the same diffusers-key mapping the checkpoint
loader is already proven against.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.pipeline.pipeline import PwwPipeline
from pww_tpu.weights.loader import clip_key, unet_key
from pww_tpu.weights.lora import (load_lora_file, merge_lora,
                                  parse_lora_state, restore_params)


def _flat_params(tree):
    """{our-path-tuple: leaf} with the 'params' level dropped."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in flat:
        path = tuple(p.key if hasattr(p, "key") else str(p) for p in keypath)
        out[tuple(p for p in path if p != "params")] = leaf
    return out


def _kohya_name(key_fn, path, rank, prefix):
    key, _ = key_fn(path, rank)
    return prefix + "_" + key[: -len(".weight")].replace(".", "_")


def _make_pipe(**kw):
    return PwwPipeline(config=SDModelConfig.tiny(), weights_dtype=None, **kw)


@pytest.fixture(scope="module")
def pipe():
    return _make_pipe()


def _dense_lora(rng, leaf_shape, r=4, alpha=None):
    """Synthetic (down, up) for a flax (in, out) dense kernel."""
    in_dim, out_dim = leaf_shape
    down = rng.standard_normal((r, in_dim)).astype(np.float32) * 0.1
    up = rng.standard_normal((out_dim, r)).astype(np.float32) * 0.1
    entry = {"lora_down.weight": down, "lora_up.weight": up}
    if alpha is not None:
        # kohya stores alpha as a 0-dim tensor
        entry["alpha"] = np.full((), alpha, np.float32)
    return down, up, entry


def test_kohya_merge_exact_math(pipe, rng):
    """Merged weight == W + scale*(alpha/r)*(up@down)^T for a unet attn site
    and a text-encoder site; untouched leaves are bitwise identical."""
    flat_unet = _flat_params(pipe.params["unet"])
    flat_clip = _flat_params(pipe.params["clip"])
    # pick one cross-attn to_q and one te q_proj
    upath = next(p for p in flat_unet if p[-2:] == ("to_q", "kernel"))
    cpath = next(p for p in flat_clip if p[-2:] == ("q_proj", "kernel"))
    u_leaf, c_leaf = flat_unet[upath], flat_clip[cpath]

    ud, uu, ue = _dense_lora(rng, u_leaf.shape, r=4, alpha=2.0)
    cd, cu, ce = _dense_lora(rng, c_leaf.shape, r=2)
    state = {}
    for leaf_name, v in ue.items():
        state[_kohya_name(unet_key, upath, 2, "lora_unet") + "." + leaf_name] = v
    for leaf_name, v in ce.items():
        state[_kohya_name(clip_key, cpath, 2, "lora_te") + "." + leaf_name] = v

    scale = 0.7
    new_params, n, touched = merge_lora(pipe.params, parse_lora_state(state), scale)
    assert n == 2
    got = _flat_params(new_params["unet"])[upath]
    want = u_leaf + scale * (2.0 / 4) * (uu @ ud).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    got_c = _flat_params(new_params["clip"])[cpath]
    want_c = c_leaf + scale * (cu @ cd).T  # no alpha -> factor 1
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=1e-5)
    # untouched leaf unchanged
    other = next(p for p in flat_unet if p[-2:] == ("to_k", "kernel"))
    assert np.array_equal(
        np.asarray(_flat_params(new_params["unet"])[other]),
        np.asarray(flat_unet[other]),
    )
    # restore is exact
    back = restore_params(new_params, touched)
    assert np.array_equal(
        np.asarray(_flat_params(back["unet"])[upath]), np.asarray(u_leaf)
    )


def test_diffusers_peft_format_matches_kohya(pipe, rng):
    """peft lora_A/lora_B keys and kohya keys produce identical merges."""
    flat_unet = _flat_params(pipe.params["unet"])
    upath = next(p for p in flat_unet if p[-2:] == ("to_v", "kernel"))
    down, up, entry = _dense_lora(rng, flat_unet[upath].shape, r=3)

    kohya = {
        _kohya_name(unet_key, upath, 2, "lora_unet") + "." + k: v
        for k, v in entry.items()
    }
    dkey = unet_key(upath, 2)[0][: -len(".weight")]
    peft = {
        f"unet.{dkey}.lora_A.weight": down,
        f"unet.{dkey}.lora_B.weight": up,
    }
    p1, n1, _ = merge_lora(pipe.params, parse_lora_state(kohya), 1.0)
    p2, n2, _ = merge_lora(pipe.params, parse_lora_state(peft), 1.0)
    assert n1 == n2 == 1
    np.testing.assert_array_equal(
        np.asarray(_flat_params(p1["unet"])[upath]),
        np.asarray(_flat_params(p2["unet"])[upath]),
    )


def test_processor_format(pipe, rng):
    """Old diffusers attention-processor naming (`processor.to_q_lora.down`)."""
    flat_unet = _flat_params(pipe.params["unet"])
    upath = next(p for p in flat_unet if p[-2:] == ("to_q", "kernel"))
    down, up, _ = _dense_lora(rng, flat_unet[upath].shape)
    dkey = unet_key(upath, 2)[0][: -len(".weight")]
    attn_path = dkey.rsplit(".", 1)[0]  # strip trailing .to_q
    state = {
        f"unet.{attn_path}.processor.to_q_lora.down.weight": down,
        f"unet.{attn_path}.processor.to_q_lora.up.weight": up,
    }
    _, n, _ = merge_lora(pipe.params, parse_lora_state(state), 1.0)
    assert n == 1


def test_conv_locon_entries(pipe, rng):
    """LoCon conv LoRA: 3x3 resnet conv and 1x1 transformer proj_in."""
    flat_unet = _flat_params(pipe.params["unet"])
    conv_path = next(p for p in flat_unet if p[-2:] == ("conv1", "kernel"))
    kh, kw, cin, cout = flat_unet[conv_path].shape
    r = 2
    down = rng.standard_normal((r, cin, kh, kw)).astype(np.float32) * 0.1
    up = rng.standard_normal((cout, r, 1, 1)).astype(np.float32) * 0.1
    name = _kohya_name(unet_key, conv_path, 4, "lora_unet")
    state = {name + ".lora_down.weight": down, name + ".lora_up.weight": up}

    # Transformer2D-level proj_in (1x1 conv, 4-D kernel) — NOT the GEGLU
    # ff.proj_in Dense that shares the leaf name
    proj_path = next(
        p for p in flat_unet
        if p[-2:] == ("proj_in", "kernel") and len(flat_unet[p].shape) == 4
    )
    _, _, pcin, pcout = flat_unet[proj_path].shape
    pdown = rng.standard_normal((r, pcin, 1, 1)).astype(np.float32) * 0.1
    pup = rng.standard_normal((pcout, r, 1, 1)).astype(np.float32) * 0.1
    pname = _kohya_name(unet_key, proj_path, 4, "lora_unet")
    state[pname + ".lora_down.weight"] = pdown
    state[pname + ".lora_up.weight"] = pup

    new_params, n, _ = merge_lora(pipe.params, parse_lora_state(state), 1.0)
    assert n == 2
    got = np.asarray(_flat_params(new_params["unet"])[conv_path])
    want_oihw = np.einsum("or,rihw->oihw", up.reshape(cout, r), down)
    want = np.asarray(flat_unet[conv_path]) + np.transpose(want_oihw, (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_full_attention_coverage(pipe, rng):
    """A LoRA touching EVERY attention linear + te linear matches 100%."""
    state = {}
    count = 0
    for tower, key_fn, prefix in (
        ("unet", unet_key, "lora_unet"), ("clip", clip_key, "lora_te"),
    ):
        for path, leaf in _flat_params(pipe.params[tower]).items():
            if path[-1] != "kernel" or len(leaf.shape) != 2:
                continue
            if not any(
                s in path[-2] for s in
                ("to_q", "to_k", "to_v", "to_out", "q_proj", "k_proj",
                 "v_proj", "out_proj", "fc1", "fc2", "proj_in", "proj_out")
            ):
                continue
            _, _, entry = _dense_lora(rng, leaf.shape, r=2)
            name = _kohya_name(key_fn, path, 2, prefix)
            for k, v in entry.items():
                state[name + "." + k] = v
            count += 1
    assert count > 10
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no unmatched-module warnings allowed
        _, n, _ = merge_lora(pipe.params, parse_lora_state(state), 1.0)
    assert n == count


def test_pipeline_load_unload_and_output_changes(rng):
    pipe = _make_pipe()
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kwargs = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="latent",
    )
    base = np.asarray(pipe.generate(**kwargs))
    before = jax.tree.map(np.asarray, pipe.params)

    flat_unet = _flat_params(pipe.params["unet"])
    state = {}
    for path, leaf in flat_unet.items():
        if path[-2:][-1] == "kernel" and len(leaf.shape) == 2 and path[-2] == "to_k":
            _, _, entry = _dense_lora(rng, leaf.shape, r=2)
            name = _kohya_name(unet_key, path, 2, "lora_unet")
            for k, v in entry.items():
                state[name + "." + k] = v
    n = pipe.load_lora(state, scale=1.0)
    assert n > 0
    with_lora = np.asarray(pipe.generate(**kwargs))
    assert not np.allclose(base, with_lora)

    pipe.unload_loras()
    after = jax.tree.map(np.asarray, pipe.params)
    jax.tree.map(np.testing.assert_array_equal, before, after)
    restored = np.asarray(pipe.generate(**kwargs))
    np.testing.assert_array_equal(base, restored)


def test_lora_stacking_scales(pipe, rng):
    """Two sequential load_lora calls add independently-scaled deltas."""
    p = _make_pipe()
    flat_unet = _flat_params(p.params["unet"])
    upath = next(q for q in flat_unet if q[-2:] == ("to_q", "kernel"))
    orig = np.asarray(flat_unet[upath])
    d1, u1, e1 = _dense_lora(rng, orig.shape, r=2)
    d2, u2, e2 = _dense_lora(rng, orig.shape, r=3)
    name = _kohya_name(unet_key, upath, 2, "lora_unet")
    p.load_lora({name + "." + k: v for k, v in e1.items()}, scale=0.5)
    p.load_lora({name + "." + k: v for k, v in e2.items()}, scale=0.25)
    got = np.asarray(_flat_params(p.params["unet"])[upath])
    want = orig + 0.5 * (u1 @ d1).T + 0.25 * (u2 @ d2).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    p.unload_loras()
    np.testing.assert_array_equal(
        np.asarray(_flat_params(p.params["unet"])[upath]), orig
    )


def test_sdxl_te1_te2_routing(rng):
    """lora_te1_/lora_te2_ keys land on clip / clip2 respectively."""
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None)
    flat1 = _flat_params(pipe.params["clip"])
    flat2 = _flat_params(pipe.params["clip2"])
    p1 = next(p for p in flat1 if p[-2:] == ("q_proj", "kernel"))
    p2 = next(p for p in flat2 if p[-2:] == ("k_proj", "kernel"))
    _, _, e1 = _dense_lora(rng, flat1[p1].shape)
    _, _, e2 = _dense_lora(rng, flat2[p2].shape)
    state = {}
    for k, v in e1.items():
        state[_kohya_name(clip_key, p1, 2, "lora_te1") + "." + k] = v
    for k, v in e2.items():
        state[_kohya_name(clip_key, p2, 2, "lora_te2") + "." + k] = v
    new_params, n, _ = merge_lora(pipe.params, parse_lora_state(state), 1.0)
    assert n == 2
    assert not np.array_equal(
        np.asarray(_flat_params(new_params["clip"])[p1]), np.asarray(flat1[p1])
    )
    assert not np.array_equal(
        np.asarray(_flat_params(new_params["clip2"])[p2]), np.asarray(flat2[p2])
    )


def test_unmatched_module_warns(pipe, rng):
    state = {
        "lora_unet_not_a_real_module.lora_down.weight":
            np.zeros((2, 8), np.float32),
        "lora_unet_not_a_real_module.lora_up.weight":
            np.zeros((8, 2), np.float32),
    }
    with pytest.warns(UserWarning, match="no matching parameter"):
        merge_lora(pipe.params, parse_lora_state(state), 1.0)


def test_load_lora_file_safetensors(tmp_path, pipe, rng):
    from safetensors.numpy import save_file

    flat_unet = _flat_params(pipe.params["unet"])
    upath = next(p for p in flat_unet if p[-2:] == ("to_q", "kernel"))
    _, _, entry = _dense_lora(rng, flat_unet[upath].shape, alpha=4.0)
    name = _kohya_name(unet_key, upath, 2, "lora_unet")
    f = str(tmp_path / "lora.safetensors")
    save_file({name + "." + k: v for k, v in entry.items()}, f)
    lora = load_lora_file(f)
    assert len(lora) == 1
    _, n, _ = merge_lora(pipe.params, lora, 1.0)
    assert n == 1


def test_train_lora_loop(tmp_path):
    """LoRA TRAINING on the tiny config: loss decreases, delta starts at
    zero (B=0 init), the kohya export round-trips through load_lora, and
    the trained adapter changes generation."""
    from PIL import Image

    from pww_tpu.training import train_lora

    pipe = _make_pipe()
    nprng = np.random.default_rng(0)
    images = [
        Image.fromarray((nprng.random((64, 64, 3)) * 80 + 90).astype(np.uint8))
        for _ in range(2)
    ]
    result = train_lora(
        pipe, images, "a photo of a thing", rank=2, num_steps=40,
        batch_size=2, learning_rate=5e-3, seed=0,
    )
    q = max(len(result.losses) // 4, 1)
    assert np.mean(result.losses[-q:]) < np.mean(result.losses[:q]), (
        np.mean(result.losses[:q]), np.mean(result.losses[-q:]))
    assert len(result.factors) > 0
    # base pipeline untouched by training
    sd = result.state_dict()
    assert any(k.endswith(".alpha") for k in sd)
    assert all(k.startswith("lora_unet_") for k in sd)

    # save -> file -> load_lora applies every trained module
    f = str(tmp_path / "trained.safetensors")
    result.save(f)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kwargs = dict(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, output_type="latent",
    )
    base = np.asarray(pipe.generate(**kwargs))
    n = pipe.load_lora(f)
    assert n == len(result.factors)
    assert not np.array_equal(base, np.asarray(pipe.generate(**kwargs)))
    pipe.unload_loras()

    # merge math: merged leaf == base + (alpha/r) * a@b for one site
    path = next(iter(result.factors))
    fac = result.factors[path]
    orig = np.asarray(_flat_params(pipe.params["unet"])[path])
    pipe.load_lora(result.state_dict())
    got = np.asarray(_flat_params(pipe.params["unet"])[path])
    want = orig + (result.alpha / result.rank) * (fac["a"] @ fac["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_train_lora_rejects_xl():
    from pww_tpu.training import train_lora

    pipe = PwwPipeline(config=SDModelConfig.tiny_xl(), weights_dtype=None)
    with pytest.raises(NotImplementedError, match="single-encoder"):
        train_lora(pipe, [np.zeros((64, 64, 3), np.uint8)], "x", num_steps=1)
