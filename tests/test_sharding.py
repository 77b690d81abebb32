"""Multi-device sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
the standard JAX fake-backend trick — validates dp/tp program correctness
without TPU pods)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pww_tpu.config import SDModelConfig
from pww_tpu.models.unet import UNet2DCondition
from pww_tpu.ops.weight_functions import WeightFunction
from pww_tpu.parallel.mesh import make_mesh, param_pspec, replicate, shard_batch, shard_params
from pww_tpu.types import PwwState


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_caches():
    """Drop the executables accumulated by ~240 earlier tests before the
    8-virtual-device programs compile — full-suite runs have segfaulted
    inside XLA:CPU's compiler at exactly this point (long-process state;
    every module passes in isolation)."""
    jax.clear_caches()
    yield


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_param_pspec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_pspec("down_0_attn_0/blocks_0/attn1/to_q/kernel") == P(None, "tp")
    assert param_pspec("mid_attn/blocks_0/attn2/to_out/kernel") == P("tp", None)
    assert param_pspec("up_1_attn_2/blocks_0/ff/proj_in/kernel") == P(None, "tp")
    assert param_pspec("down_0_resnet_0/conv1/kernel") == P()


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_unet_matches_single_device(dp, tp):
    """dp×tp sharded forward must equal the unsharded forward bitwise-ish."""
    cfg = SDModelConfig.tiny()
    unet = UNet2DCondition(cfg.unet)
    h = w = 8
    n = 8  # batch divisible by every dp
    rng = jax.random.PRNGKey(0)
    params = unet.init(
        rng, jnp.zeros((1, h, w, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.clip.hidden_size)),
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, 4))
    text = jax.random.normal(jax.random.PRNGKey(2), (n, 77, cfg.clip.hidden_size))
    weights = {
        h * w: jax.random.uniform(jax.random.PRNGKey(3), (n, h * w, 77)),
        h * w // 4: jax.random.uniform(jax.random.PRNGKey(4), (n, h * w // 4, 77)),
    }
    pww = PwwState(weights=weights, weight_orig=None, sigma=jnp.float32(2.0),
                   weight_fn=WeightFunction())

    want = np.asarray(unet.apply(params, lat, jnp.float32(10.0), text, pww=pww))

    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[:8])
    sp = shard_params(params, mesh)
    slat = shard_batch(lat, mesh)
    stext = shard_batch(text, mesh)
    spww = PwwState(
        weights={k: shard_batch(v, mesh) for k, v in weights.items()},
        weight_orig=None, sigma=jnp.float32(2.0), weight_fn=WeightFunction(),
    )

    @jax.jit
    def fwd(p, l, t, pw):
        return unet.apply(p, l, jnp.float32(10.0), t, pww=pw)

    with mesh:
        got = np.asarray(fwd(sp, slat, stext, spww))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_dryrun_multichip_entry():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_pipeline_with_mesh_end_to_end():
    """Full pipeline with a dp×tp mesh on 8 virtual devices — batch of 4
    samples sharded dp=4, UNet params tensor-parallel tp=2."""
    import numpy as np

    from pww_tpu.pipeline.pipeline import PwwPipeline

    mesh = make_mesh(dp=4, tp=2, devices=jax.devices()[:8])
    pipe = PwwPipeline(config=SDModelConfig.tiny(), mesh=mesh)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, num_samples=4, output_type="np",
    )
    assert out.shape == (4, 64, 64, 3)

    # TP correctness: at f32 the sharded pipeline matches the unsharded one
    # to reassociation noise (measured 2e-6); bf16 drifts only via psum
    # rounding, checked loosely above by shape/finite-ness.
    kw = dict(prompt="a cat", color_map_image=cm,
              color_context={(255, 0, 0): "cat,1.0"},
              num_inference_steps=2, seed=0, num_samples=4,
              return_latents=True)
    f32 = dict(weights_dtype=None, compute_dtype=jnp.float32)
    lat_ref = np.asarray(
        PwwPipeline(config=SDModelConfig.tiny(), **f32).generate(**kw)
    )
    lat_sharded = np.asarray(
        PwwPipeline(config=SDModelConfig.tiny(), mesh=mesh, **f32).generate(**kw)
    )
    rel = np.abs(lat_sharded - lat_ref).mean() / np.abs(lat_ref).mean()
    assert rel < 1e-4, rel


def test_spatial_sharding_pipeline():
    """sharding='spatial': latent height sharded over dp — single-image model
    parallelism for high resolutions; f32 output equals unsharded to ~1e-5."""
    import numpy as np

    from pww_tpu.pipeline.pipeline import PwwPipeline

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    kw = dict(prompt="a cat", color_map_image=cm,
              color_context={(255, 0, 0): "cat,1.0"},
              num_inference_steps=2, seed=0, return_latents=True)
    f32 = dict(weights_dtype=None, compute_dtype=jnp.float32)
    ref = np.asarray(PwwPipeline(config=SDModelConfig.tiny(), **f32).generate(**kw))
    got = np.asarray(
        PwwPipeline(config=SDModelConfig.tiny(), mesh=mesh, **f32).generate(
            sharding="spatial", **kw
        )
    )
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 1e-4, rel


def test_sdxl_pipeline_with_mesh():
    """SDXL conditioning (pooled embeds + time_ids) shards over dp alongside
    the latents/text; dp x tp mesh end-to-end on the tiny XL config."""
    import numpy as np

    from pww_tpu.pipeline.pipeline import PwwPipeline

    mesh = make_mesh(dp=4, tp=2, devices=jax.devices()[:8])
    pipe = PwwPipeline(config=SDModelConfig.tiny_xl(), mesh=mesh)
    cm = np.zeros((64, 64, 3), np.uint8)
    cm[:, :32] = (255, 0, 0)
    out = pipe.generate(
        prompt="a cat", color_map_image=cm,
        color_context={(255, 0, 0): "cat,1.0"},
        num_inference_steps=2, seed=0, num_samples=4, output_type="np",
    )
    assert out.shape == (4, 64, 64, 3)
