"""Frozen configuration dataclasses for the PwW-TPU framework.

The reference keeps configuration implicit (function kwargs + a `.env` token,
see reference `setup.py`, `runner.py:9-72`). Here every model / scheduler /
pipeline knob is an explicit frozen dataclass so configs hash, compare, and act
as static jit arguments.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text-encoder hyperparameters (SD 1.x uses openai/clip-vit-large-patch14)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    # SD 1.x CLIP uses quick_gelu; SD 2.x OpenCLIP uses gelu.
    hidden_act: str = "quick_gelu"
    # text_projection output dim (SDXL pooled conditioning); None = no head
    projection_dim: Optional[int] = None
    # EOS token id for pooled-output position (None -> argmax-of-ids
    # fallback, which breaks if added/TI token ids exceed the EOS id)
    eos_token_id: Optional[int] = None

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sdxl_l() -> "CLIPTextConfig":
        """SDXL text_encoder: CLIP ViT-L/14 (penultimate hidden used; no
        projection head — pooled conditioning comes from text_encoder_2)."""
        return CLIPTextConfig()

    @staticmethod
    def sdxl_bigg() -> "CLIPTextConfig":
        """SDXL text_encoder_2: OpenCLIP ViT-bigG/14 text tower."""
        return CLIPTextConfig(
            hidden_size=1280, intermediate_size=5120, num_layers=32,
            num_heads=20, hidden_act="gelu", projection_dim=1280,
            eos_token_id=49407,
        )

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        """Small config for tests."""
        return CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_position_embeddings=77,
        )


@dataclasses.dataclass(frozen=True)
class LDMBertConfig:
    """LDM-BERT text encoder (original CompVis latent-diffusion conditioning).

    Defaults match the reference converter's ``create_ldm_bert_config``
    (reference `change_model_path.py:312-319`): ``d_model = n_embed``,
    ``encoder_layers = n_layer``, ``ffn_dim = 4·n_embed``, with diffusers'
    ``LDMBertConfig`` defaults for everything it leaves unset — 8 heads of
    64 dims (so the attention inner dim is 512, NOT ``d_model``), BERT vocab
    30522, 77 positions. The canonical txt2img-1p4B checkpoint has
    ``n_embed=1280, n_layer=32``.
    """

    vocab_size: int = 30522
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 8
    head_dim: int = 64
    ffn_dim: int = 5120
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim

    @staticmethod
    def tiny() -> "LDMBertConfig":
        return LDMBertConfig(
            vocab_size=100, d_model=32, num_layers=2, num_heads=2,
            head_dim=8, ffn_dim=64, max_position_embeddings=16,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision tower (IP-Adapter image conditioning).

    Defaults match OpenCLIP ViT-H/14 (the encoder the published SD-1.5
    IP-Adapter checkpoints pair with).
    """

    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 1024

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
            image_size=32, patch_size=8, projection_dim=24,
        )


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD UNet2DConditionModel hyperparameters.

    Defaults mirror the SD-1.5 architecture the reference loads via diffusers
    (reference `paint_with_words/paint_with_words.py:174-189`).
    """

    in_channels: int = 4
    out_channels: int = 4
    sample_size: int = 64
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # SD-1.x: 8 attention heads at every resolution; head_dim = channels // 8.
    # SD-2.x instead fixes head_dim=64 (set attention_head_dim; it wins).
    num_attention_heads: int = 8
    attention_head_dim: Optional[int] = None
    cross_attention_dim: int = 768
    # "epsilon" (SD-1.x) or "v_prediction" (SD-2.x 768-v)
    prediction_type: str = "epsilon"
    norm_num_groups: int = 32
    time_embed_mult: int = 4
    # Which down/up blocks carry cross-attention transformers. SD-1.x: all but
    # the innermost down block / outermost up block.
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    # Transformer blocks per attention site, per down block (SD-1.x/2.x: 1
    # everywhere; SDXL: (1, 2, 10) with no attention in block 0). None = 1.
    transformer_depth: Optional[Tuple[int, ...]] = None
    # SDXL micro-conditioning: "text_time" adds pooled-text + size/crop
    # fourier embeddings to the timestep embedding.
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    # input width of the add_embedding MLP (SDXL-base: 1280 + 6*256 = 2816)
    projection_class_embeddings_input_dim: Optional[int] = None
    # LCM-distilled checkpoints: width of the Fourier guidance-scale
    # embedding projected into the timestep embedding (diffusers
    # `time_cond_proj_dim`; e.g. 256 for LCM-Dreamshaper). None = off.
    time_cond_proj_dim: Optional[int] = None
    # IP-Adapter: number of image-prompt tokens attended by the decoupled
    # to_k_ip/to_v_ip projections at every cross-attention site (4 for the
    # standard published adapters). None = no image conditioning params.
    ip_adapter_tokens: Optional[int] = None
    # Pallas kernels, measured at 512² on v5e (full-UNet step, bf16):
    #   XLA-dense everything 54 ms · +fused cross-attn 32 ms · +flash 26 ms.
    # Isolated op micro-benchmarks invert this ordering (dispatch overhead +
    # no HBM pressure) — trust the in-context numbers (docs/ARCHITECTURE.md).
    flash_attention: bool = True  # Pallas flash self-attention (L >= flash_min_seq)
    fused_cross_attention: bool = True  # Pallas PwW bias+softmax+V epilogue
    # Kernel tuning (config-level so every perf knob lives here, not in env
    # vars). xattn_block_q: q-block of the fused cross-attn + reduce kernels
    # (1024 measured 22.3 vs 22.9 ms/step at 512² over 512). flash_min_seq:
    # self-attn sequence length at which the flash kernel beats XLA-dense
    # (below it the dense softmax fits VMEM anyway and dispatch wins).
    xattn_block_q: int = 1024
    flash_min_seq: int = 1024
    flash_block: int = 1024  # flash self-attention q/k block
    # Zero-pad Q/K/V head dims to 128 lanes in HBM before the flash kernel
    # (True, the round-1..4 behavior) vs handing the kernel dh-lane blocks
    # directly (False — skips six materialized pad passes + two output-slice
    # passes per site; the MXU work is identical). Default False per the
    # round-5 interleaved A/Bs: b8 512² 4.710 vs 4.890 s (−3.7%,
    # benchmarks/AB_KERNELS_512_b8_b8x.json) and b1 512² 0.7281 vs 0.7329 s
    # (benchmarks/AB_KERNELS_512_b8x.json). See PERF_DEFAULTS.md.
    flash_pad_heads: bool = False
    # ResNet 3×3 conv lowering: "xla" (native conv), "im2col" (explicit
    # patches + one GEMM: K = 9·C_in), "nchw" (NCHW dimension numbers).
    # Round-5 experiment knobs for the b8 MXU gap; see PERF_DEFAULTS.md.
    conv_lowering: str = "xla"
    # Pallas fused GroupNorm(+pre-add+SiLU) and LayerNorm(+cast). Default
    # OFF: the interleaved full-step A/B (benchmarks/AB_KERNELS_512_b8_gn
    # .json, b8 512² 30-step) shows XLA norms fastest in every variant
    # (4.970 s vs 5.031 LN / 5.154 GN / 5.233 both), and BENCH_r04 recorded
    # a 26-35% b1 regression with these on (b1 denoise is HBM-bound at 85%
    # of roofline — the kernels' extra HBM passes hurt most there). The
    # kernels remain available as opt-in knobs with 1-ulp parity tests.
    # See PERF_DEFAULTS.md before changing these.
    fused_group_norm: bool = False
    fused_layer_norm: bool = False
    # PwW cross-attention implementation variant (for A/B measurement on a
    # shared chip and as a fallback):
    #   "fused"            Pallas blockwise reduce + q-block-major epilogue
    #   "fused_head_major" Pallas blockwise reduce + head-major epilogue
    #   "two_pass"         jnp reduce (materializes scores) + epilogue
    xattn_variant: str = "fused"
    # ToMe token merging around self-attention (Bolya & Hoffman 2023) —
    # opt-in APPROXIMATION like DeepCache. 0.0 = exact/off; tomesd's default
    # is 0.5 at the full-resolution sites only (tome_min_tokens).
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
    # FreeU (Si et al. 2023) decoder re-weighting: (b1, b2, s1, s2) —
    # backbone-channel gains for the two deepest up blocks and low-frequency
    # scales for their skip connections. None = off (exact). A free-lunch
    # quality knob; does not change parameters.
    freeu: Optional[Tuple[float, float, float, float]] = None
    # Self-Attention Guidance (Hong et al. 2023): sow the mid-block's first
    # self-attention probabilities so the SAG denoise loop can build its
    # blur mask. Enabled per-call by generate(sag_scale=...); no params.
    sow_mid_attn: bool = False

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))

    def depth_for(self, block_index: int) -> int:
        """Transformer depth of down block ``block_index`` (up blocks use the
        mirrored index)."""
        if self.transformer_depth is None:
            return 1
        return self.transformer_depth[block_index]

    def heads_for(self, channels: int) -> Tuple[int, int]:
        """(num_heads, head_dim) at a resolution. SD-1.x: fixed head count;
        SD-2.x: fixed head_dim=64 via ``attention_head_dim``."""
        if self.attention_head_dim is not None:
            return channels // self.attention_head_dim, self.attention_head_dim
        return self.num_attention_heads, channels // self.num_attention_heads

    @staticmethod
    def sd21(v_prediction: bool = True) -> "UNetConfig":
        """SD-2.1 (768-v by default): head_dim 64, 1024-dim OpenCLIP context."""
        return UNetConfig(
            attention_head_dim=64,
            cross_attention_dim=1024,
            sample_size=96 if v_prediction else 64,
            prediction_type="v_prediction" if v_prediction else "epsilon",
        )

    @staticmethod
    def sd15(in_channels: int = 4) -> "UNetConfig":
        return UNetConfig(in_channels=in_channels)

    @staticmethod
    def sdxl() -> "UNetConfig":
        """SDXL-base: 3 stages, transformer depth (0-attn, 2, 10), 2048-dim
        dual-CLIP context, pooled-text + size/crop micro-conditioning."""
        return UNetConfig(
            block_out_channels=(320, 640, 1280),
            attention_head_dim=64,
            cross_attention_dim=2048,
            sample_size=128,
            down_block_has_attn=(False, True, True),
            transformer_depth=(0, 2, 10),
            addition_embed_type="text_time",
            projection_class_embeddings_input_dim=2816,
        )

    @staticmethod
    def sd15_inpaint() -> "UNetConfig":
        """9-channel inpainting UNet (runwayml/stable-diffusion-inpainting)."""
        return UNetConfig(in_channels=9)

    @staticmethod
    def tiny(in_channels: int = 4, cross_attention_dim: int = 32) -> "UNetConfig":
        return UNetConfig(
            in_channels=in_channels,
            block_out_channels=(32, 64),
            layers_per_block=1,
            num_attention_heads=4,
            cross_attention_dim=cross_attention_dim,
            norm_num_groups=8,
            down_block_has_attn=(True, False),
            sample_size=16,
        )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL hyperparameters (SD 1.x)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    # Pallas fused GroupNorm(+SiLU) where the per-row slab fits VMEM (the
    # small-spatial encoder/decoder levels); big levels fall back to XLA.
    # Default OFF per the interleaved A/B — see UNetConfig.fused_group_norm
    # and PERF_DEFAULTS.md.
    fused_group_norm: bool = False

    @staticmethod
    def sd15() -> "VAEConfig":
        return VAEConfig()

    @property
    def scale_factor(self) -> int:
        """Spatial downsampling factor (8 for SD: 3 stride-2 stages)."""
        return 2 ** (len(self.block_out_channels) - 1)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(8, 16, 16, 32), layers_per_block=1,
            norm_num_groups=4,
        )


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Noise schedule shared by every scheduler.

    Matches the reference's hardcoded LMS construction
    (reference `paint_with_words/paint_with_words.py:197-202`).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 0
    # DDIM final-step ᾱ_prev: True → 1.0 (diffusers' bare-constructor default,
    # what the reference's `DDIMScheduler()` gets), False → ᾱ[0] (the value SD
    # checkpoints ship in scheduler_config.json; PNDM always uses ᾱ[0] per its
    # own diffusers default). Set False when matching a converted checkpoint.
    set_alpha_to_one: bool = True
    # Karras et al. (2022) ρ=7 sigma spacing for the sigma-space schedulers
    # (lms/euler/euler_ancestral/heun) — the popular "Karras" sampler variants.
    use_karras_sigmas: bool = False
    # LCM: the distillation grid size — inference timesteps are drawn from
    # the teacher's `original_inference_steps`-point DDIM grid.
    original_inference_steps: int = 50
    # LCM consistency-boundary scalings: c_skip/c_out are evaluated at
    # `timestep_scaling * t` with pseudo-huber constant sigma_data.
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for data/tensor parallel execution."""

    data_axis: str = "dp"
    model_axis: str = "tp"
    data_parallel: int = 1
    tensor_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class SDModelConfig:
    """Full SD model family bundle."""

    clip: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig.sd15)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig.sd15)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig.sd15)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    # second text encoder (SDXL dual-CLIP); None for SD-1.x/2.x
    clip2: Optional[CLIPTextConfig] = None
    # SDXL-base ships force_zeros_for_empty_prompt=true: an empty negative
    # prompt uses ALL-ZERO uncond embeddings (text + pooled) instead of
    # encoding "" (diffusers StableDiffusionXLPipeline.encode_prompt).
    force_zeros_for_empty_prompt: bool = True
    # SDXL-refiner: a SINGLE text tower (the bigG, stored in the `clip`
    # slot), 1280-dim context, and 5-element time_ids ending in the
    # aesthetic score instead of target size (diffusers
    # requires_aesthetics_score=true).
    xl_refiner: bool = False

    @property
    def is_xl(self) -> bool:
        return self.clip2 is not None

    @property
    def needs_pooled(self) -> bool:
        """text_time micro-conditioning: a pooled text embedding is a UNet
        input (SDXL base via clip2, SDXL refiner via the single tower)."""
        return self.unet.addition_embed_type == "text_time"

    @property
    def pooled_dim(self) -> int:
        src = self.clip2 if self.clip2 is not None else self.clip
        if src.projection_dim is None:
            raise ValueError("text_time conditioning needs projection_dim")
        return src.projection_dim

    @property
    def num_time_ids(self) -> int:
        """Length of the time_ids vector (6 for base XL size/crop/target;
        5 for the refiner's size/crop/aesthetic-score)."""
        return (
            self.unet.projection_class_embeddings_input_dim - self.pooled_dim
        ) // self.unet.addition_time_embed_dim

    @staticmethod
    def sd15() -> "SDModelConfig":
        return SDModelConfig()

    @staticmethod
    def sdxl() -> "SDModelConfig":
        """SDXL-base-1.0: dual CLIP (ViT-L + OpenCLIP bigG, penultimate
        hidden states concatenated to a 2048-dim context), pooled-text +
        size/crop micro-conditioning, 0.13025 VAE scaling."""
        return SDModelConfig(
            clip=CLIPTextConfig.sdxl_l(),
            clip2=CLIPTextConfig.sdxl_bigg(),
            unet=UNetConfig.sdxl(),
            vae=VAEConfig(scaling_factor=0.13025),
        )

    @staticmethod
    def sdxl_refiner() -> "SDModelConfig":
        """SDXL-refiner-1.0: single bigG tower (1280-dim context), 4 stages
        (384/768/1536/1536) with attention only in the middle two (depth 4),
        aesthetic-score micro-conditioning (2560 = 1280 + 5*256)."""
        return SDModelConfig(
            clip=CLIPTextConfig.sdxl_bigg(),
            unet=UNetConfig(
                block_out_channels=(384, 768, 1536, 1536),
                attention_head_dim=64,
                cross_attention_dim=1280,
                sample_size=128,
                down_block_has_attn=(False, True, True, False),
                transformer_depth=(4, 4, 4, 4),
                addition_embed_type="text_time",
                projection_class_embeddings_input_dim=2560,
            ),
            vae=VAEConfig(scaling_factor=0.13025),
            xl_refiner=True,
        )

    @staticmethod
    def tiny_xl_refiner() -> "SDModelConfig":
        """Tiny refiner-shaped config: ONE projected tower, 5-element
        aesthetic time_ids, attention only in the inner block."""
        clip = CLIPTextConfig(
            vocab_size=1000, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, hidden_act="gelu", projection_dim=48,
            eos_token_id=1,  # toy tokenizer's eos
        )
        return SDModelConfig(
            clip=clip,
            unet=UNetConfig(
                block_out_channels=(32, 64),
                layers_per_block=1,
                num_attention_heads=4,
                cross_attention_dim=clip.hidden_size,
                norm_num_groups=8,
                down_block_has_attn=(False, True),
                transformer_depth=(0, 2),
                addition_embed_type="text_time",
                addition_time_embed_dim=8,
                projection_class_embeddings_input_dim=48 + 5 * 8,
                sample_size=16,
            ),
            vae=VAEConfig.tiny(),
            xl_refiner=True,
        )

    @staticmethod
    def tiny_xl() -> "SDModelConfig":
        """Tiny SDXL-shaped config: dual encoders, concat context, text_time
        micro-conditioning, depth-2 transformers, no attention in block 0."""
        clip = CLIPTextConfig.tiny()
        clip2 = CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, hidden_act="gelu", projection_dim=64,
            eos_token_id=1,  # toy tokenizer's eos
        )
        return SDModelConfig(
            clip=clip,
            clip2=clip2,
            unet=UNetConfig(
                block_out_channels=(32, 64),
                layers_per_block=1,
                num_attention_heads=4,
                cross_attention_dim=clip.hidden_size + clip2.hidden_size,
                norm_num_groups=8,
                down_block_has_attn=(False, True),
                transformer_depth=(0, 2),
                addition_embed_type="text_time",
                addition_time_embed_dim=8,
                projection_class_embeddings_input_dim=64 + 6 * 8,
                sample_size=16,
            ),
            vae=VAEConfig.tiny(),
        )

    @staticmethod
    def sd21(v_prediction: bool = True) -> "SDModelConfig":
        return SDModelConfig(
            clip=CLIPTextConfig(
                vocab_size=49408, hidden_size=1024, intermediate_size=4096,
                num_layers=23, num_heads=16, hidden_act="gelu",
            ),
            unet=UNetConfig.sd21(v_prediction),
        )

    @staticmethod
    def sd15_inpaint() -> "SDModelConfig":
        return SDModelConfig(unet=UNetConfig.sd15_inpaint())

    @staticmethod
    def tiny(in_channels: int = 4) -> "SDModelConfig":
        clip = CLIPTextConfig.tiny()
        return SDModelConfig(
            clip=clip,
            unet=UNetConfig.tiny(
                in_channels=in_channels, cross_attention_dim=clip.hidden_size
            ),
            vae=VAEConfig.tiny(),
        )
