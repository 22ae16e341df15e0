"""TTSEngine: the IndexTTS2-equivalent inference orchestrator, TPU-native.

Pipeline parity with reference `indextts/infer_v2.py` (`IndexTTS2.infer` /
`infer_generator`), redesigned around jitted fixed-shape stage graphs:

- prompt conditioning runs at one static 15 s shape with exact masking
  (cached per prompt content hash, improving on the identity-keyed cache at
  `infer_v2.py:507-550`);
- text decode / latent / s2mel / vocoder stages compile per shape bucket;
- the GPT AR loop is a jitted `lax.while_loop` (see models/gpt/decode.py).

Stage timer fields keep the reference names (gpt_gen_time, gpt_forward_time,
s2mel_time, bigvgan_time, rtf — `infer_v2.py:755-761`).
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
import time
from functools import partial
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.audio import (
    KaldiFbank, MelSpectrogram, Resampler, encode_wav_int16, load_prompt_audio,
)
from voice_tts_tpu.audio.kaldi import SeamlessFeatures
from voice_tts_tpu.config import TTSConfig
from voice_tts_tpu.engine import post
from voice_tts_tpu.logging import logger
from voice_tts_tpu.models.conditioning import CAMPPlus, RepCodec, Wav2Vec2Bert
from voice_tts_tpu.models.conditioning.repcodec import repcodec_vq2emb
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.beam import (beam_decode, beam_decode_batch,
                                           beam_decode_fused_batch)
from voice_tts_tpu.models.gpt.decode import DecodeResult
from voice_tts_tpu.models.gpt.decode import decode as gpt_decode
from voice_tts_tpu.models.gpt.decode import spec_decode
from voice_tts_tpu.models.s2mel import S2Mel
from voice_tts_tpu.models.s2mel.cfm import cfm_inference
from voice_tts_tpu.models.s2mel.s2mel import (
    assemble_condition, place_prompt_mel, slice_generated,
)
from voice_tts_tpu.models.vocoder import BigVGAN
from voice_tts_tpu.text import TextNormalizer, TextTokenizer
from voice_tts_tpu.text.emotion import EMOTIONS


@dataclasses.dataclass
class InferenceResult:
    wav: np.ndarray              # int16 mono
    sample_rate: int
    metrics: Dict[str, float]


class HashTokenizer:
    """Deterministic char-hash tokenizer for random-weight benchmarking when
    no BPE model artifact is available."""

    punctuation_marks_tokens = [".", "!", "?"]

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size
        self.unk_token_id = 2

    def tokenize(self, text: str) -> List[str]:
        return [c for c in text if not c.isspace()]

    def convert_tokens_to_ids(self, tokens) -> List[int]:
        if isinstance(tokens, str):
            tokens = [tokens]
        base = self.vocab_size - 10
        return [int(hashlib.md5(t.encode()).hexdigest(), 16) % base + 3
                for t in tokens]

    def split_segments(self, tokens: List[str], max_text_tokens_per_segment=120,
                       quick_streaming_tokens: int = 0) -> List[List[str]]:
        return TextTokenizer.split_segments_by_token(
            tokens, self.punctuation_marks_tokens, max_text_tokens_per_segment,
            quick_streaming_tokens)


class TTSEngine:
    SR_MEL = 22050
    SR_COND = 16000

    def __init__(self, cfg: TTSConfig, params: Dict[str, dict], tokenizer,
                 extras: Optional[Dict[str, np.ndarray]] = None,
                 dtype: jnp.dtype = jnp.float32):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        extras = extras or {}

        # models
        self.gpt = UnifiedVoice(cfg.gpt)
        self.s2mel = S2Mel(cfg.s2mel)
        self.vocoder = BigVGAN(cfg.vocoder)
        self.campplus = CAMPPlus(cfg.campplus)
        self.repcodec = RepCodec(cfg.semantic_codec)
        self.w2v = Wav2Vec2Bert(cfg.w2v_bert)

        # frontends
        self.mel_fn = MelSpectrogram(cfg.mel)
        self.seamless = SeamlessFeatures(sample_rate=self.SR_COND)
        self.fbank = KaldiFbank(sample_rate=self.SR_COND, waveform_scale=32768.0)

        h = cfg.w2v_bert.hidden_size
        self.w2v_mean = jnp.asarray(extras.get("w2v_mean", np.zeros(h, np.float32)))
        self.w2v_std = jnp.asarray(extras.get("w2v_std", np.ones(h, np.float32)))
        self.emo_matrix = extras.get("emo_matrix")  # list of (n_i, model_dim)
        self.spk_matrix = extras.get("spk_matrix")  # list of (n_i, 192)

        # static prompt shapes (15 s)
        self.prompt_samples_16k = int(cfg.engine.max_prompt_seconds * self.SR_COND)
        self.prompt_samples_22k = int(cfg.engine.max_prompt_seconds * self.SR_MEL)
        self.prompt_mel_frames = self.mel_fn.num_frames(self.prompt_samples_22k)
        self.w2v_frames = self.seamless.num_output_frames(self.prompt_samples_16k)

        self.qwen_emo = None  # optional QwenEmotion (text-driven emotion)
        # generation-config memo: configs hash by identity (jit static args),
        # so per-request overrides must map to stable objects or every call
        # would recompile the decode graph
        self._gen_cache: Dict[tuple, object] = {}
        # bf16 GPT runtime params for decode + teacher-forced latent
        # (reference runs fp16 autocast on the GPT only, `infer_v2.py:628,695`)
        self.fused_pack = None
        self.spec_draft_pack = None
        self.readout_pack = None
        self.device = None   # set by `to_device` (per-chip serving replicas)
        self._tp_mesh = None
        if cfg.engine.tensor_parallel > 1:
            # megatron-style TP over an ICI "tp" axis (replaces the
            # reference's dormant HF `parallelize()` layer split,
            # `indextts/gpt/model_v2.py:61-77`).  Single-chip fast paths
            # (fused megakernel, Pallas GEMV) are per-chip kernels — TP
            # decode takes the XLA path where collectives are inserted
            # by sharding propagation.
            from voice_tts_tpu.parallel import make_mesh
            tp = cfg.engine.tensor_parallel
            devs = jax.devices()
            if len(devs) < tp:
                raise ValueError(
                    f"tensor_parallel={tp} but only {len(devs)} devices")
            self._tp_mesh = make_mesh(("tp",), devices=devs[:tp])
        # effective fast-path flags (decided locally — never written back to
        # the caller's cfg, which may be shared across engines)
        use_int8 = cfg.engine.use_int8_decode and self._tp_mesh is None
        use_fused = cfg.engine.use_fused_decode and self._tp_mesh is None
        if use_int8:
            from voice_tts_tpu.utils.quantize import quantize_gpt_params
            self.params_gpt_rt = quantize_gpt_params(params["gpt"])
            if use_fused:
                if cfg.engine.use_int4_decode:
                    # int4 tiles quantize from the ORIGINAL f32 weights
                    from voice_tts_tpu.ops.fused_decode import pack_gpt_int4
                    self.fused_pack = pack_gpt_int4(
                        params["gpt"], cfg.gpt.layers,
                        group=cfg.engine.int4_group)
                else:
                    from voice_tts_tpu.ops.fused_decode import pack_gpt
                    self.fused_pack = pack_gpt(self.params_gpt_rt,
                                               cfg.gpt.layers)
                if cfg.engine.fold_readout:
                    from voice_tts_tpu.ops.fused_decode import pack_readout
                    self.readout_pack = pack_readout(self.params_gpt_rt)
                if cfg.engine.spec_decode_k >= 2:
                    if cfg.engine.use_int4_decode:
                        raise ValueError(
                            "spec_decode_k needs the int8 target pack; "
                            "unset use_int4_decode (int4 becomes the DRAFT)")
                    if cfg.engine.use_int8_kv:
                        raise ValueError(
                            "spec_decode_k has no int8-KV support; unset "
                            "use_int8_kv (the speculative verify kernel "
                            "reads/writes the bf16 cache)")
                    from voice_tts_tpu.ops.fused_decode import pack_gpt_int4
                    self.spec_draft_pack = pack_gpt_int4(
                        params["gpt"], cfg.gpt.layers,
                        group=cfg.engine.int4_group)
        elif cfg.engine.use_fp16:
            self.params_gpt_rt = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params["gpt"])
        else:
            self.params_gpt_rt = params["gpt"]
        if self._tp_mesh is not None:
            from voice_tts_tpu.parallel import shard_params
            self.params_gpt_rt = shard_params(self.params_gpt_rt,
                                              self._tp_mesh)
        if cfg.engine.use_bf16_s2mel:
            self.params_s2mel_rt = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params["s2mel"])
        else:
            self.params_s2mel_rt = params["s2mel"]
        # packed vocoder: grouped-conv resblocks (op-count-bound stage fix)
        self._packed_voc = False
        self._fused_voc = False
        self.params_voc_rt = params["vocoder"]
        self._shared_act_voc = False
        if cfg.engine.use_packed_vocoder:
            from voice_tts_tpu.models.vocoder.packed import can_pack, pack_bigvgan
            if can_pack(cfg.vocoder):
                self.params_voc_rt = pack_bigvgan(params["vocoder"],
                                                  cfg.vocoder)
                self._packed_voc = True
        elif cfg.engine.use_shared_act_vocoder:
            from voice_tts_tpu.models.vocoder.packed import (can_pack,
                                                             pack_bigvgan_shared)
            if can_pack(cfg.vocoder):
                self.params_voc_rt = pack_bigvgan_shared(params["vocoder"],
                                                         cfg.vocoder)
                self._shared_act_voc = True
        elif cfg.engine.use_fused_vocoder and jax.default_backend() == "tpu":
            # fused resblock-stage Pallas kernels for the late (C <= 192)
            # stages; packs ride along with the param tree so every jitted
            # graph receives them as ARGUMENTS (closing over them would bake
            # the weights into the serialized HLO)
            from voice_tts_tpu.ops.attic.fused_vocoder import (fused_stage_plan,
                                                         pack_fused_stages)
            if any(fused_stage_plan(cfg.vocoder)):
                packs = jax.jit(
                    lambda p: pack_fused_stages(p, cfg.vocoder))(
                        params["vocoder"])
                self.params_voc_rt = {"tree": params["vocoder"],
                                      "packs": packs}
                self._fused_voc = True
        # cold-prompt conditioning runtime trees: a NEW speaker pays the
        # w2v-bert(17)+RepCodec+CAMPPlus forward at the 15 s static shape
        # per request (244 ms f32 on v5e — bench_results/r4); bf16 runs the
        # matmuls at MXU rate, mirroring the reference's fp16 autocast
        # (`infer_v2.py:628`).  The GPT conditioning pass reuses the bf16
        # runtime GPT tree (conformer/perceiver weights are bf16 there;
        # get_conditioning never touches the int8 trunk modules)
        if cfg.engine.use_bf16_conditioning:
            def _bf16(tree):
                return jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    tree)
            self.params_cond_rt = {fam: _bf16(params[fam])
                                   for fam in ("w2v", "repcodec", "campplus")}
            self._cond_gpt_params = (self.params_gpt_rt
                                     if self._tp_mesh is None
                                     else params["gpt"])
        else:
            self.params_cond_rt = {fam: params[fam]
                                   for fam in ("w2v", "repcodec", "campplus")}
            self._cond_gpt_params = params["gpt"]
        if cfg.engine.release_master_trees:
            # inference never reads these f32 masters once the runtime
            # trees exist (grep: params["gpt"]/["w2v"] appear only in
            # __init__); aliasing them to the runtime trees lets jax free
            # ~4 GB of flagship HBM.  `engine.params` stays structurally
            # complete for to_device; artifact saving from a serving
            # engine saves the runtime precision (documented on the flag)
            self.params["gpt"] = self.params_gpt_rt
            if cfg.engine.use_bf16_conditioning:
                self.params["w2v"] = self.params_cond_rt["w2v"]
        self._resamplers: Dict[Tuple[int, int], Resampler] = {}
        self._spk_cache: Dict[str, dict] = {}
        self._emo_cache: Dict[str, jnp.ndarray] = {}
        # per-text-bucket longest observed decode length (adaptive decode
        # cap, see `_decode_cap` / `_observe_code_len`)
        self._cap_hint: Dict[int, int] = {}
        self._rng = jax.random.PRNGKey(cfg.engine.seed)

        self._build_jit_fns()

    # ------------------------------------------------------------------
    # factories
    # ------------------------------------------------------------------

    @classmethod
    def from_artifacts(cls, directory: str,
                       profile: Optional[str] = None) -> "TTSEngine":
        """Load a converted model directory
        (see `voice_tts_tpu.utils.artifacts`).

        `profile="serving"` applies the production fast-path profile
        (`TTSConfig.apply_serving_profile`) on top of the artifact config —
        the measured-winner megakernel/quantization flags the server and
        CLI enable by default.  `None`/"stock" keeps the artifact config
        as saved.
        """
        from voice_tts_tpu.text import SentencePieceBPE, TextNormalizer
        from voice_tts_tpu.text.tokenizer import TextTokenizer
        from voice_tts_tpu.utils.artifacts import load_artifacts, split_matrix_groups

        cfg, params, extras, bpe_bytes = load_artifacts(directory)
        if profile == "serving":
            cfg.apply_serving_profile()
        elif profile not in (None, "stock"):
            raise ValueError(f"unknown profile {profile!r} "
                             "(expected 'serving' or 'stock')")
        missing = [f for f in ("gpt", "s2mel", "vocoder", "campplus",
                               "repcodec", "w2v") if f not in params]
        if missing:
            raise FileNotFoundError(f"missing model families in {directory}: "
                                    f"{missing}")
        if "emo_matrix_raw" in extras:
            extras["emo_matrix"] = split_matrix_groups(
                extras.pop("emo_matrix_raw"), cfg.engine.emo_num)
        if "spk_matrix_raw" in extras:
            extras["spk_matrix"] = split_matrix_groups(
                extras.pop("spk_matrix_raw"), cfg.engine.emo_num)
        if bpe_bytes:
            from voice_tts_tpu.text import sp_model
            normalizer = TextNormalizer()
            normalizer.load()
            sp = SentencePieceBPE(sp_model.parse_model(bpe_bytes))
            tokenizer = TextTokenizer(sp, normalizer)
        else:
            tokenizer = HashTokenizer(cfg.gpt.number_text_tokens)
        return cls(cfg, params, tokenizer, extras)

    @classmethod
    def tiny(cls, seed: int = 0, **engine_overrides) -> "TTSEngine":
        """Miniature random-weight engine (CPU-friendly smoke tests).

        `engine_overrides` set `cfg.engine` fields BEFORE construction
        (needed for flags consumed in `__init__`, e.g. vocoder variants)."""
        cfg = TTSConfig.tiny()
        cfg.engine.max_prompt_seconds = 1.0
        cfg.generation.max_mel_tokens = 24
        cfg.generation.num_beams = 1
        # keep the cross-model dims consistent at tiny scale
        cfg.w2v_bert.feature_projection_input_dim = 160
        cfg.gpt.condition_module.input_size = cfg.w2v_bert.hidden_size
        cfg.gpt.emo_condition_module.input_size = cfg.w2v_bert.hidden_size
        cfg.semantic_codec.hidden_size = cfg.w2v_bert.hidden_size
        cfg.s2mel.dit.content_dim = cfg.s2mel.length_regulator.channels
        cfg.s2mel.gpt_dim = cfg.gpt.model_dim
        cfg.s2mel.gpt_layer_out = cfg.w2v_bert.hidden_size
        cfg.s2mel.dit.in_channels = cfg.mel.num_mels
        cfg.s2mel.dit.style_dim = cfg.campplus.embedding_size
        cfg.s2mel.wavenet.hidden_dim = cfg.s2mel.dit.hidden_dim
        cfg.vocoder.num_mels = cfg.mel.num_mels
        for k, v in engine_overrides.items():
            if not hasattr(cfg.engine, k):
                raise AttributeError(f"unknown engine config field: {k}")
            setattr(cfg.engine, k, v)
        return cls.random(cfg, seed=seed)

    @classmethod
    def random(cls, cfg: TTSConfig, seed: int = 0) -> "TTSEngine":
        """Random-weight engine (benchmarks / tests; no checkpoint needed)."""
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, 8)
        c = cfg

        # jit every init: eager initialization dispatches thousands of single
        # ops (prohibitive over remote-device transports)
        gpt = UnifiedVoice(c.gpt)
        text = jnp.zeros((1, 8), dtype=jnp.int32)
        gpt_params = jax.jit(partial(gpt.init, method=UnifiedVoice.init_all))(
            keys[0], jnp.zeros((1, 6, c.gpt.condition_module.input_size)),
            jnp.zeros((1, 6, c.gpt.emo_condition_module.input_size)),
            text, jnp.asarray([8]), jnp.zeros((1, 6), dtype=jnp.int32),
            jnp.asarray([6]))

        s2 = S2Mel(c.s2mel)
        d = c.s2mel.dit
        s2_params = jax.jit(s2.init, static_argnums=4)(
            keys[1], jnp.zeros((1, 6, c.semantic_codec.hidden_size)),
            jnp.asarray([6]), jnp.asarray([8]), 8,
            jnp.zeros((1, d.in_channels, 8)), jnp.zeros((1, d.in_channels, 8)),
            jnp.asarray([8]), jnp.zeros((1,)), jnp.zeros((1, d.style_dim)),
            jnp.zeros((1, 4, c.s2mel.gpt_dim)))

        voc = BigVGAN(c.vocoder)
        voc_params = jax.jit(voc.init)(keys[2],
                                       jnp.zeros((1, c.vocoder.num_mels, 8)))

        camp = jax.jit(CAMPPlus(c.campplus).init)(
            keys[3], jnp.zeros((1, 16, c.campplus.feat_dim)))
        rep = jax.jit(RepCodec(c.semantic_codec).init)(
            keys[4], jnp.zeros((1, 8, c.semantic_codec.hidden_size)))
        w2v = jax.jit(Wav2Vec2Bert(c.w2v_bert).init)(
            keys[5], jnp.zeros((1, 8, c.w2v_bert.feature_projection_input_dim)))

        emo_dim = c.gpt.model_dim
        extras = {
            "w2v_mean": np.zeros(c.w2v_bert.hidden_size, np.float32),
            "w2v_std": np.ones(c.w2v_bert.hidden_size, np.float32),
            "emo_matrix": [np.asarray(jax.random.normal(keys[6], (n, emo_dim)))
                           * 0.05 for n in c.engine.emo_num],
            "spk_matrix": [np.asarray(jax.random.normal(keys[7], (n, c.campplus.embedding_size)))
                           for n in c.engine.emo_num],
        }
        params = {"gpt": gpt_params, "s2mel": s2_params, "vocoder": voc_params,
                  "campplus": camp, "repcodec": rep, "w2v": w2v}
        return cls(cfg, params, HashTokenizer(c.gpt.number_text_tokens), extras)

    def to_device(self, device) -> "TTSEngine":
        """Commit every parameter tree to `device` so all compute for this
        replica runs there (serving DP: one replica per chip, replacing the
        reference's CUDA_VISIBLE_DEVICES rewrite in gunicorn `post_fork`,
        `gunicorn_config.py:43-60`).  Uncommitted per-request inputs follow
        the committed parameters under JAX placement rules.  No-op under
        tensor parallelism (params carry mesh shardings)."""
        if self._tp_mesh is not None:
            return self
        self.device = device

        # memoize by array identity: params_*_rt trees alias params[...]
        # under default flags, and device_put-ing aliases independently
        # would duplicate every weight buffer on the chip
        moved: Dict[int, jax.Array] = {}

        def put_arr(x):
            if not isinstance(x, jax.Array):
                return x
            key = id(x)
            if key not in moved:
                moved[key] = jax.device_put(x, device)
            return moved[key]

        def put(tree):
            return jax.tree.map(put_arr, tree)

        for name in ("params", "params_gpt_rt", "params_s2mel_rt",
                     "params_voc_rt", "params_cond_rt", "_cond_gpt_params",
                     "fused_pack", "spec_draft_pack", "readout_pack",
                     "w2v_mean", "w2v_std"):
            setattr(self, name, put(getattr(self, name)))
        # frontend filter constants (mel basis, fbank windows, resampler
        # taps) are uncommitted arrays on the default device; without a
        # committed operand their jitted transforms would all run on chip 0
        for obj in (self.mel_fn, self.seamless, self.fbank,
                    *self._resamplers.values()):
            for attr, val in list(vars(obj).items()):
                setattr(obj, attr, put(val))
        self._rng = jax.device_put(self._rng, device)
        self._spk_cache.clear()
        self._emo_cache.clear()
        return self

    # ------------------------------------------------------------------
    # jitted stage graphs
    # ------------------------------------------------------------------

    def _build_jit_fns(self):
        cfg = self.cfg

        def _tree_dt(p):
            # compute dtype follows the (possibly bf16) runtime param tree;
            # convs require matching operand dtypes, so inputs are cast at
            # each model boundary while stats/normalization stay f32
            return jax.tree.leaves(p)[0].dtype

        def prompt_features_body(w2v_params, rep_params, camp_params,
                                 s2_params, audio16, n16, audio22_prepad,
                                 mel_frames):
            feats, mask = self.seamless(audio16, n16)
            emb = self.w2v.apply(w2v_params, feats.astype(_tree_dt(w2v_params)),
                                 mask)
            emb = (emb.astype(jnp.float32) - self.w2v_mean) / self.w2v_std
            w2v_len = mask.sum(axis=1)

            _, s_ref = self.repcodec.apply(rep_params,
                                           emb.astype(_tree_dt(rep_params)))
            ref_mel = self.mel_fn.on_prepadded(audio22_prepad)

            fb = self.fbank(audio16)
            fb_frames = jnp.maximum((n16 - 400) // 160 + 1, 0)
            fmask = (jnp.arange(fb.shape[1])[None, :] < fb_frames[:, None])
            fmean = (jnp.sum(fb * fmask[..., None], axis=1, keepdims=True)
                     / fb_frames[:, None, None])
            fb = (fb - fmean) * fmask[..., None]
            style = self.campplus.apply(camp_params,
                                        fb.astype(_tree_dt(camp_params)),
                                        fb_frames)

            prompt_condition = self.s2mel.apply(
                s2_params, s_ref.astype(_tree_dt(s2_params)), w2v_len,
                mel_frames, self.prompt_mel_frames,
                method=S2Mel.regulate)
            return (emb, w2v_len, ref_mel, style.astype(jnp.float32),
                    prompt_condition)

        self._prompt_features = jax.jit(prompt_features_body)

        @jax.jit
        def speaker_conditioning_graph(w2v_params, rep_params, camp_params,
                                       s2_params, gpt_params, audio16, n16,
                                       audio22_prepad, mel_frames):
            """The ENTIRE new-speaker conditioning pipeline in ONE dispatch
            (remote-attached chips pay a round trip per dispatch; the cold
            path previously issued three)."""
            emb, w2v_len, ref_mel, style, prompt_condition = \
                prompt_features_body(w2v_params, rep_params, camp_params,
                                     s2_params, audio16, n16, audio22_prepad,
                                     mel_frames)
            dt = _float_dt(gpt_params)
            cond_latents = self.gpt.apply(gpt_params, emb.astype(dt), w2v_len,
                                          method=UnifiedVoice.get_conditioning)
            spk_emovec = self.gpt.apply(gpt_params, emb.astype(dt), w2v_len,
                                        method=UnifiedVoice.get_emovec)
            return (emb, w2v_len, ref_mel, style, prompt_condition,
                    cond_latents, spk_emovec)

        self._speaker_conditioning_graph = speaker_conditioning_graph

        @jax.jit
        def emo_features(w2v_params, audio16, n16):
            feats, mask = self.seamless(audio16, n16)
            emb = self.w2v.apply(w2v_params, feats.astype(_tree_dt(w2v_params)),
                                 mask)
            emb = (emb.astype(jnp.float32) - self.w2v_mean) / self.w2v_std
            return emb, mask.sum(axis=1)

        self._emo_features = emo_features

        def _float_dt(p):
            # first FLOATING leaf dtype (the int8 runtime GPT tree holds
            # int8 trunk weights; the conformer/perceiver weights are the
            # bf16/f32 compute dtype the convs require inputs to match)
            for x in jax.tree.leaves(p):
                if (hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating)):
                    return x.dtype
            return jnp.float32

        @jax.jit
        def gpt_conditioning(gpt_params, spk_emb, spk_len):
            return self.gpt.apply(gpt_params,
                                  spk_emb.astype(_float_dt(gpt_params)),
                                  spk_len,
                                  method=UnifiedVoice.get_conditioning)

        self._gpt_conditioning = gpt_conditioning

        @jax.jit
        def gpt_emovec(gpt_params, emb, length):
            return self.gpt.apply(gpt_params,
                                  emb.astype(_float_dt(gpt_params)), length,
                                  method=UnifiedVoice.get_emovec)

        self._gpt_emovec = gpt_emovec

        def s2mel_body(s2_params, rep_params, latent, codes, code_len,
                       prompt_condition, prompt_len, ref_mel, style, rng,
                       mel_bucket):
            latent2 = self.s2mel.apply(s2_params, latent, method=S2Mel.gpt_layer)
            s_infer = repcodec_vq2emb(rep_params, codes) + latent2
            target_len = jnp.floor(code_len.astype(jnp.float32)
                                   * cfg.s2mel.mel_scale_factor).astype(jnp.int32)
            cond = self.s2mel.apply(s2_params, s_infer, code_len, target_len,
                                    mel_bucket, method=S2Mel.regulate)
            # prompt bucket is carried by the (statically shaped) inputs
            total_max = prompt_condition.shape[1] + mel_bucket
            cat, total_len = assemble_condition(prompt_condition, prompt_len,
                                                cond, target_len, total_max)
            prompt_x = place_prompt_mel(ref_mel, prompt_len, total_max)

            # whole-trunk DiT megakernel: packed per solve (NOT per step —
            # this sits outside the Euler scan), weights ride as traced
            # values derived from the s2_params argument
            from voice_tts_tpu.ops.attic.dit_blocks import (can_fuse_dit,
                                                      pack_dit_blocks,
                                                      pack_dit_tables)
            dcfg = cfg.s2mel.dit
            use_fused_dit = (dcfg.fused_blocks and cat.shape[0] == 1
                             and total_max <= 768 and can_fuse_dit(dcfg))

            def dit_apply(p, x, prompt_x, lens, t, style_v, mu, tab):
                # compute dtype follows the param tree (bf16 runtime tree
                # under use_bf16_s2mel); CFM state x stays f32 in the caller
                dt = jax.tree.leaves(p)[0].dtype
                def conv(a):
                    return a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a
                v = self.s2mel.apply(p, conv(x), conv(prompt_x), lens,
                                     t, conv(style_v), conv(mu),
                                     tables=tab, fused_w=fused_w,
                                     method=S2Mel.velocity)
                return v.astype(jnp.float32)

            # hoist every timestep-dependent projection out of the Euler
            # scan: one batched evaluation over the whole step schedule
            n_steps = cfg.engine.diffusion_steps
            t_mids = jnp.linspace(0.0, 1.0, n_steps + 1)[:n_steps]
            tables = self.s2mel.apply(s2_params, t_mids,
                                      method=S2Mel.step_tables)
            fused_w = None
            if use_fused_dit:
                est = {"params": s2_params["params"]["estimator"]}
                fused_w = pack_dit_blocks(est, dcfg.depth)
                tables["fused_wb"] = pack_dit_tables(est, tables, dcfg.depth)
            mel = cfm_inference(dit_apply, s2_params, cat, total_len, prompt_x,
                                prompt_len, style, rng,
                                n_steps,
                                cfg.engine.inference_cfg_rate, tables=tables,
                                unroll=cfg.engine.cfm_unroll)
            gen = slice_generated(mel, prompt_len, mel_bucket)
            # zero the bucket tail: frames past target_len still hold CFM
            # noise (the velocity is masked there), and the vocoder's first
            # conv would smear it into the last valid frames.  Zeros match
            # the exact-length torch run's zero conv padding at the boundary.
            frame = jnp.arange(mel_bucket)
            gen = jnp.where(frame[None, None, :] < target_len[:, None, None],
                            gen, 0.0)
            return gen, target_len

        @partial(jax.jit, static_argnames=("code_bucket", "mel_bucket"))
        def s2mel_chain(s2_params, rep_params, latent, codes, code_len,
                        prompt_condition, prompt_len, ref_mel, style, rng,
                        code_bucket, mel_bucket):
            return s2mel_body(s2_params, rep_params, latent, codes, code_len,
                              prompt_condition, prompt_len, ref_mel, style,
                              rng, mel_bucket)

        self._s2mel_chain = s2mel_chain

        def vocode_body(voc_params, mel):
            if self._packed_voc:
                from voice_tts_tpu.models.vocoder.packed import (
                    bigvgan_packed_apply)
                wav = bigvgan_packed_apply(voc_params, mel, cfg.vocoder)
            elif self._shared_act_voc:
                from voice_tts_tpu.models.vocoder.packed import (
                    bigvgan_shared_act_apply)
                wav = bigvgan_shared_act_apply(voc_params, mel, cfg.vocoder)
            elif self._fused_voc:
                from voice_tts_tpu.ops.attic.fused_vocoder import bigvgan_fused_apply
                wav = bigvgan_fused_apply(voc_params["tree"],
                                          voc_params["packs"], mel,
                                          cfg.vocoder)
            else:
                wav = self.vocoder.apply(voc_params, mel)
            wav = jnp.clip(wav * 32767.0, -32767.0, 32767.0).astype(jnp.int16)
            # (B, frames, hop): both minor dims are tile-aligned, so the
            # device buffer carries no padding — (B, 1, T) int16 would pad the
            # sublane dim 1 -> 32 and transfer 32x the bytes
            b = wav.shape[0]
            return wav.reshape(b, -1, cfg.mel.hop_size)

        self._vocode = jax.jit(vocode_body)

        @partial(jax.jit, static_argnames=())
        def gpt_latent(gpt_params, cond, emovec, text, text_len, codes, code_len):
            return self.gpt.apply(gpt_params, cond, emovec, text, text_len,
                                  codes, code_len)

        self._gpt_latent = gpt_latent

        @jax.jit
        def pack_decode(res):
            # codes + lengths + hit_limit in ONE int32 array: a single host
            # readback instead of three (each sync costs a full round trip
            # on a remote-attached chip)
            return jnp.concatenate(
                [res.codes, res.lengths[:, None],
                 res.hit_limit[:, None].astype(jnp.int32)], axis=1)

        self._pack_decode = pack_decode

        @partial(jax.jit, static_argnames=("code_bucket", "mel_bucket"))
        def synth_chain(gpt_params, s2_params, rep_params, voc_params,
                        cond, emovec, text, text_len, codes, code_len,
                        prompt_condition, prompt_len, ref_mel, style, rng,
                        code_bucket, mel_bucket):
            """Post-decode synthesis as ONE graph: teacher-forced GPT latent ->
            s2mel (regulator + 25-step CFM) -> BigVGAN -> int16 wav.  A single
            dispatch + a single host transfer — each extra host sync costs a
            full round trip on a remote-attached chip, and XLA can fuse across
            the former stage boundaries (latent -> gpt_layer, mel -> conv_pre).
            """
            latent = self.gpt.apply(gpt_params, cond, emovec, text, text_len,
                                    codes, code_len)
            mel, target_len = s2mel_body(
                s2_params, rep_params, latent, codes, code_len,
                prompt_condition, prompt_len, ref_mel, style, rng, mel_bucket)
            return vocode_body(voc_params, mel), target_len

        self._synth_chain = synth_chain

        @partial(jax.jit,
                 static_argnames=("gen", "cbucket", "mel_bucket", "max_new"))
        def segment_pipeline(gpt_params, fused_pack, s2_params, rep_params,
                             voc_params, cond, emovec, text, text_len,
                             prompt_condition, prompt_len, ref_mel, style,
                             rng, gen, cbucket, mel_bucket, max_new):
            """The ENTIRE segment on device in one dispatch: GPT AR decode ->
            silence-run trim -> teacher-forced latent -> s2mel CFM -> BigVGAN.

            Zero host round trips between decode and synthesis (the split
            path costs one RTT to fetch codes, trim on host and pick the code
            bucket; here the code bucket is pinned to max_mel_tokens'
            bucket up front).  Returns one int16 (B, frames + 1, hop) buffer:
            the last row carries [target_len, code_len, hit_limit] metadata
            so the host needs exactly ONE transfer per segment.

            rng is (2, 2) uint32: [decode key, synthesis key] — split by the
            caller exactly like the split path so the two paths consume
            identical streams (wav-exact parity under greedy decode).
            """
            rng_d, rng_s = rng[0], rng[1]
            target_pack, draft_pack, ro_pack = fused_pack
            if cfg.engine.spec_decode_k >= 2 and draft_pack is not None:
                # self-speculative: int4 drafts, ONE int8 verify pass per
                # K tokens; rejection sampling keeps the output distribution
                # exactly the int8 path's (models/gpt/decode.spec_decode)
                res = spec_decode(gpt_params, self.gpt, gen, cond, emovec,
                                  text, text_len, rng_d, max_new=max_new,
                                  pack_target=target_pack,
                                  pack_draft=draft_pack,
                                  k_spec=cfg.engine.spec_decode_k,
                                  int4_expand=cfg.engine.int4_expand,
                                  merge_stages=cfg.engine.merge_decode_stages)
            else:
                res = gpt_decode(gpt_params, self.gpt, gen, cond, emovec,
                                 text, text_len, rng_d, max_new=max_new,
                                 fused_pack=target_pack,
                                 int8_kv=cfg.engine.use_int8_kv,
                                 int4_expand=cfg.engine.int4_expand,
                                 merge_stages=cfg.engine.merge_decode_stages,
                                 readout_pack=ro_pack)
            # stop token excluded unless the row never produced one
            # (reference `infer_v2.py:676-687`)
            code_len0 = jnp.maximum(
                res.lengths - (~res.hit_limit).astype(res.lengths.dtype), 1)
            codes, code_len = post.remove_long_silence_jax(
                res.codes, code_len0, cfg.gpt.stop_mel_token,
                cfg.engine.silent_token)
            if cbucket < codes.shape[1]:
                codes = codes[:, :cbucket]
                code_len = jnp.minimum(code_len, cbucket)
            elif cbucket > codes.shape[1]:
                codes = jnp.pad(codes, ((0, 0), (0, cbucket - codes.shape[1])))
            latent = self.gpt.apply(gpt_params, cond, emovec, text, text_len,
                                    codes, code_len)
            mel, target_len = s2mel_body(
                s2_params, rep_params, latent, codes, code_len,
                prompt_condition, prompt_len, ref_mel, style, rng_s,
                mel_bucket)
            wav = vocode_body(voc_params, mel)
            meta = jnp.zeros((wav.shape[0], 1, wav.shape[2]), jnp.int16)
            meta = meta.at[:, 0, 0].set(target_len.astype(jnp.int16))
            meta = meta.at[:, 0, 1].set(code_len.astype(jnp.int16))
            meta = meta.at[:, 0, 2].set(res.hit_limit.astype(jnp.int16))
            return jnp.concatenate([wav, meta], axis=1)

        self._segment_pipeline = segment_pipeline

    def _fetch_decode(self, res):
        """One-transfer fetch of a DecodeResult -> (codes, lengths, hit)."""
        packed = np.asarray(self._pack_decode(res))
        return packed[:, :-2], packed[:, -2], packed[:, -1].astype(bool)

    # ------------------------------------------------------------------
    # prompt handling
    # ------------------------------------------------------------------

    def _resample(self, audio: np.ndarray, src: int, dst: int) -> np.ndarray:
        if src == dst:
            return audio
        key = (src, dst)
        if key not in self._resamplers:
            rs = Resampler(src, dst)
            if self.device is not None:
                # keep lazily-built resamplers on this replica's chip too
                # (see `to_device`)
                for attr, val in list(vars(rs).items()):
                    rs.__dict__[attr] = jax.tree.map(
                        lambda x: jax.device_put(x, self.device)
                        if isinstance(x, jax.Array) else x, val)
            self._resamplers[key] = rs
        return np.asarray(self._resamplers[key](audio[None, :]))[0]

    @staticmethod
    def _content_key(audio_input) -> str:
        if isinstance(audio_input, (bytes, bytearray)):
            return hashlib.sha256(audio_input).hexdigest()
        if isinstance(audio_input, str):
            return "path:" + audio_input
        arr = np.asarray(audio_input[0] if isinstance(audio_input, tuple)
                         else audio_input)
        return hashlib.sha256(arr.tobytes()).hexdigest()

    def _prepare_prompt_buffers(self, audio: np.ndarray, sr: int):
        a16 = self._resample(audio, sr, self.SR_COND)
        a22 = self._resample(audio, sr, self.SR_MEL)
        n16 = min(len(a16), self.prompt_samples_16k)
        n22 = min(len(a22), self.prompt_samples_22k)
        buf16 = np.zeros((1, self.prompt_samples_16k), np.float32)
        buf16[0, :n16] = a16[:n16]
        # reflect-pad at the true boundary, then zero-pad to the bucket
        pad = (self.cfg.mel.n_fft - self.cfg.mel.hop_size) // 2
        pre = np.zeros((1, self.prompt_samples_22k + 2 * pad), np.float32)
        seg = self.mel_fn.pad_reflect(a22[None, :n22])
        pre[:, :seg.shape[1]] = seg
        mel_frames = self.mel_fn.num_frames(n22)
        return buf16, n16, pre, mel_frames

    def _speaker_conditioning(self, spk_audio_prompt) -> dict:
        key = self._content_key(spk_audio_prompt)
        if key in self._spk_cache:
            self._spk_cache[key] = self._spk_cache.pop(key)  # LRU touch
            return self._spk_cache[key]
        audio, sr = load_prompt_audio(spk_audio_prompt,
                                      self.cfg.engine.max_prompt_seconds)
        buf16, n16, pre22, mel_frames = self._prepare_prompt_buffers(audio, sr)
        (emb, w2v_len, ref_mel, style, prompt_condition, cond_latents,
         spk_emovec) = self._speaker_conditioning_graph(
            self.params_cond_rt["w2v"], self.params_cond_rt["repcodec"],
            self.params_cond_rt["campplus"],
            self.params["s2mel"], self._cond_gpt_params,
            jnp.asarray(buf16), jnp.asarray([n16]),
            jnp.asarray(pre22), jnp.asarray([mel_frames]))
        entry = {
            "emb": emb, "w2v_len": w2v_len, "ref_mel": ref_mel, "style": style,
            "prompt_condition": prompt_condition, "mel_frames": mel_frames,
            "cond_latents": cond_latents, "spk_emovec": spk_emovec,
        }
        self._spk_cache_put(key, entry)
        return entry

    _SPK_CACHE_CAP = 32

    def _spk_cache_put(self, key, entry):
        while len(self._spk_cache) >= self._SPK_CACHE_CAP:  # LRU eviction
            self._spk_cache.pop(next(iter(self._spk_cache)))
        self._spk_cache[key] = entry

    def _speaker_conditioning_batch(self, prompts: List) -> None:
        """Warm the conditioning cache for a GROUP of prompts in ONE batched
        forward (new speakers only).  A fleet workload is mostly cache
        misses (measured c16 unique-speaker serving: aggregate RTF 0.2171
        vs 0.0651 with 3 shared prompts — bench_results/r4): per-request
        conditioning serializes ~244 ms apiece, while one B-row forward
        amortizes the w2v-bert weight stream across the group.  Rows are
        padded to a {1,2,4,8} bucket (repeat row 0) so serving compiles at
        most 4 conditioning graphs.  The reference recomputes conditioning
        per request with no batching (`infer_v2.py:507-550`)."""
        missing: Dict[str, tuple] = {}
        for p in prompts:
            key = self._content_key(p)
            if key in self._spk_cache:
                self._spk_cache[key] = self._spk_cache.pop(key)  # LRU touch
            elif key not in missing:
                audio, sr = load_prompt_audio(
                    p, self.cfg.engine.max_prompt_seconds)
                missing[key] = self._prepare_prompt_buffers(audio, sr)
        if not missing:
            return
        keys = list(missing)
        m = len(keys)
        b = 1
        while b < m:
            b *= 2
        rows = [missing[k] for k in keys]
        rows += [rows[0]] * (b - m)
        buf16 = np.concatenate([r[0] for r in rows], axis=0)
        n16 = np.asarray([r[1] for r in rows], np.int32)
        pre22 = np.concatenate([r[2] for r in rows], axis=0)
        mel_frames = np.asarray([r[3] for r in rows], np.int32)
        (emb, w2v_len, ref_mel, style, prompt_condition, cond_latents,
         spk_emovec) = self._speaker_conditioning_graph(
            self.params_cond_rt["w2v"], self.params_cond_rt["repcodec"],
            self.params_cond_rt["campplus"],
            self.params["s2mel"], self._cond_gpt_params,
            jnp.asarray(buf16), jnp.asarray(n16),
            jnp.asarray(pre22), jnp.asarray(mel_frames))
        for i, key in enumerate(keys):
            self._spk_cache_put(key, {
                "emb": emb[i:i + 1], "w2v_len": w2v_len[i:i + 1],
                "ref_mel": ref_mel[i:i + 1], "style": style[i:i + 1],
                "prompt_condition": prompt_condition[i:i + 1],
                "mel_frames": int(mel_frames[i]),
                "cond_latents": cond_latents[i:i + 1],
                "spk_emovec": spk_emovec[i:i + 1],
            })

    def _emotion_conditioning(self, emo_audio_prompt) -> jnp.ndarray:
        key = self._content_key(emo_audio_prompt)
        if key in self._emo_cache:
            self._emo_cache[key] = self._emo_cache.pop(key)  # LRU touch
            return self._emo_cache[key]
        audio, sr = load_prompt_audio(emo_audio_prompt,
                                      self.cfg.engine.max_prompt_seconds)
        buf16, n16, _, _ = self._prepare_prompt_buffers(audio, sr)
        emb, length = self._emo_features(self.params_cond_rt["w2v"],
                                         jnp.asarray(buf16),
                                         jnp.asarray([n16]))
        emovec = self._gpt_emovec(self._cond_gpt_params, emb, length)
        while len(self._emo_cache) >= 16:
            self._emo_cache.pop(next(iter(self._emo_cache)))
        self._emo_cache[key] = emovec
        return emovec

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def _generation_config(self, overrides: Optional[dict]):
        base = self.cfg.generation
        if not overrides:
            return base
        kv = tuple(sorted((k, v) for k, v in overrides.items()
                          if hasattr(base, k)))
        if kv not in self._gen_cache:
            self._gen_cache[kv] = dataclasses.replace(base, **dict(kv))
        return self._gen_cache[kv]

    def _code_buckets(self) -> Tuple[int, ...]:
        return tuple(self.cfg.engine.code_buckets)

    def _mel_bucket_for(self, code_bucket: int) -> int:
        m = int(math.ceil(code_bucket * self.cfg.s2mel.mel_scale_factor))
        return m + (-m) % 16

    def _prepare(self, spk_audio_prompt, emo_audio_prompt, emo_alpha,
                 emo_vector, use_emo_text, emo_text, use_random, text,
                 max_text_tokens_per_segment, quick_streaming_tokens=0):
        """Emotion-source resolution + conditioning + segmentation
        (reference `infer_v2.py:476-583`)."""
        if use_emo_text or emo_vector is not None:
            emo_audio_prompt = None
        if use_emo_text:
            if self.qwen_emo is None:
                raise RuntimeError(
                    "text-driven emotion requires the Qwen emotion model: "
                    "set engine.qwen_emo = QwenEmotion.from_pretrained(dir)")
            emo_dict = self.qwen_emo.inference(emo_text if emo_text is not None
                                               else text)
            logger.info("detected emotion vectors from text: %s", emo_dict)
            emo_vector = list(emo_dict.values())
        if emo_vector is not None:
            scale = max(0.0, min(1.0, emo_alpha))
            if scale != 1.0:
                emo_vector = [int(x * scale * 10000) / 10000 for x in emo_vector]
        if emo_audio_prompt is None:
            emo_audio_prompt = spk_audio_prompt
            emo_alpha = 1.0

        spk = self._speaker_conditioning(spk_audio_prompt)
        emo_emovec = self._emotion_conditioning(emo_audio_prompt)

        # merge_emovec: base + alpha * (emo - base) (reference model_v2.py:742)
        emovec = spk["spk_emovec"] + emo_alpha * (emo_emovec - spk["spk_emovec"])

        if emo_vector is not None and self.emo_matrix is not None:
            weights = np.asarray(emo_vector, np.float32)
            weight_sum = float(weights.sum())
            rows = []
            style_np = np.asarray(spk["style"])[0]
            for gi, mat in enumerate(self.emo_matrix):
                spk_mat = np.asarray(self.spk_matrix[gi])
                if use_random:
                    idx = np.random.randint(0, spk_mat.shape[0])
                else:
                    sims = (spk_mat @ style_np) / (
                        np.linalg.norm(spk_mat, axis=1)
                        * np.linalg.norm(style_np) + 1e-9)
                    idx = int(np.argmax(sims))
                rows.append(np.asarray(mat)[idx] * weights[gi])
            emovec_mat = jnp.asarray(np.sum(rows, axis=0))[None, :]
            emovec = emovec_mat + (1.0 - weight_sum) * emovec

        tokens = self.tokenizer.tokenize(text)
        segments = self.tokenizer.split_segments(
            tokens, max_text_tokens_per_segment=max_text_tokens_per_segment,
            quick_streaming_tokens=quick_streaming_tokens)
        return spk, emovec, segments

    def infer_generator(self, spk_audio_prompt, text: str,
                        emo_audio_prompt=None, emo_alpha: float = 1.0,
                        emo_vector: Optional[List[float]] = None,
                        use_emo_text: bool = False,
                        emo_text: Optional[str] = None,
                        use_random: bool = False, interval_silence: int = 200,
                        verbose: bool = False,
                        max_text_tokens_per_segment: int = 120,
                        quick_streaming_tokens: int = 0,
                        **generation_kwargs):
        """Streaming synthesis: yields per-segment int16 waveforms followed by
        the inter-segment silence gap (mirrors `stream_return=True`,
        reference `infer_v2.py:745-749`).

        `quick_streaming_tokens` keeps the first ~N tokens of text in smaller
        unmerged segments so first audio arrives sooner (reference
        `infer_v2.py:467,583` -> `front.py:406-415`).
        """
        spk, emovec, segments = self._prepare(
            spk_audio_prompt, emo_audio_prompt, emo_alpha, emo_vector,
            use_emo_text, emo_text, use_random, text,
            max_text_tokens_per_segment, quick_streaming_tokens)
        timers = {"gpt_gen_time": 0.0, "gpt_forward_time": 0.0,
                  "s2mel_time": 0.0, "bigvgan_time": 0.0}
        sil = np.zeros(int(self.cfg.engine.sample_rate * interval_silence
                           / 1000.0), dtype=np.int16)
        for i, seg in enumerate(segments):
            wav = self._synthesize_segment(seg, spk, emovec, timers, verbose,
                                           generation_kwargs)
            yield wav.astype(np.int16)
            if i < len(segments) - 1 and interval_silence > 0:
                yield sil

    def infer(self, spk_audio_prompt, text: str, output_path: Optional[str] = None,
              emo_audio_prompt=None, emo_alpha: float = 1.0,
              emo_vector: Optional[List[float]] = None,
              use_emo_text: bool = False, emo_text: Optional[str] = None,
              use_random: bool = False, interval_silence: int = 200,
              verbose: bool = False, max_text_tokens_per_segment: int = 120,
              stream_return: bool = False, more_segment_before: int = 0,
              **generation_kwargs) -> InferenceResult:
        """Synthesize `text` in the voice of `spk_audio_prompt`.

        Mirrors `IndexTTS2.infer` (reference `infer_v2.py:437-463`); returns
        an InferenceResult and optionally writes an int16 WAV.  With
        `stream_return=True` returns the segment generator instead.

        `more_segment_before` is the reference's name for the segmentation
        knob it forwards positionally into `infer_generator`'s
        `quick_streaming_tokens` (`infer_v2.py:442,449,467`): the first ~N
        tokens stay in smaller unmerged segments.
        """
        if stream_return:
            return self.infer_generator(
                spk_audio_prompt, text, emo_audio_prompt, emo_alpha,
                emo_vector, use_emo_text, emo_text, use_random,
                interval_silence, verbose, max_text_tokens_per_segment,
                more_segment_before, **generation_kwargs)
        start_time = time.perf_counter()
        cfg = self.cfg
        spk, emovec, segments = self._prepare(
            spk_audio_prompt, emo_audio_prompt, emo_alpha, emo_vector,
            use_emo_text, emo_text, use_random, text,
            max_text_tokens_per_segment, more_segment_before)

        timers = {"gpt_gen_time": 0.0, "gpt_forward_time": 0.0,
                  "s2mel_time": 0.0, "bigvgan_time": 0.0,
                  "prepare_time": time.perf_counter() - start_time}
        gen = self._generation_config(generation_kwargs)
        if self._should_batch_segments(segments, gen):
            # batch the segments through the infer_batch job machinery:
            # decode advances all segments together (wall ~ longest segment,
            # weights/KV traffic amortize across rows)
            jobs = [{"tokens": seg, "spk": spk, "emovec": emovec}
                    for seg in segments]
            self._run_segment_jobs(jobs, gen, timers)
            wavs: List[np.ndarray] = [j["wav"] for j in jobs]
        else:
            wavs = []
            for seg in segments:
                wav = self._synthesize_segment(seg, spk, emovec, timers,
                                               verbose, generation_kwargs)
                wavs.append(wav)

        full = post.insert_interval_silence(wavs, cfg.engine.sample_rate,
                                            interval_silence)
        total = time.perf_counter() - start_time
        wav_len = len(full) / cfg.engine.sample_rate
        metrics = {**timers, "inference_time": total,
                   "audio_length": wav_len,
                   "rtf": total / wav_len if wav_len > 0 else 0.0}
        if "pipeline_time" in timers:
            logger.info("pipeline_time: %.2f s (decode+trim+synthesis fused; "
                        "set fuse_pipeline=False for the stage split)",
                        timers["pipeline_time"])
        logger.info("gpt_gen_time: %.2f s", timers["gpt_gen_time"])
        if "synthesis_time" in timers:
            logger.info("synthesis_time: %.2f s (latent+s2mel+vocoder fused; "
                        "set fuse_synthesis=False for the per-stage split)",
                        timers["synthesis_time"])
        else:
            logger.info("gpt_forward_time: %.2f s", timers["gpt_forward_time"])
            logger.info("s2mel_time: %.2f s", timers["s2mel_time"])
            logger.info("bigvgan_time: %.2f s", timers["bigvgan_time"])
        logger.info("RTF: %.4f", metrics["rtf"])

        wav_i16 = full.astype(np.int16)
        if output_path:
            with open(output_path, "wb") as f:
                f.write(encode_wav_int16(wav_i16, cfg.engine.sample_rate))
        return InferenceResult(wav_i16, cfg.engine.sample_rate, metrics)

    # ------------------------------------------------------------------
    # batched inference (continuous batching backend)
    # ------------------------------------------------------------------

    def infer_batch(self, requests: List[dict]) -> List[InferenceResult]:
        """Synthesize several requests together, batching GPT decode and the
        s2mel/vocoder stages across their segments.

        Each request dict accepts the `infer` keyword surface
        (spk_audio_prompt, text, emo_audio_prompt, emo_alpha, emo_vector,
        interval_silence, ...).  This replaces the reference's one-request-
        per-worker mutex (`server.py:25,384`) with step-level batching.
        """
        cfg = self.cfg
        start = time.perf_counter()

        # one batched conditioning forward for all NEW speakers in the group
        # (the per-request path would serialize ~244 ms per cache miss)
        self._speaker_conditioning_batch(
            [req["spk_audio_prompt"] for req in requests])

        prepared = []
        jobs = []  # (req_idx, seg_idx, tokens, spk_entry, emovec)
        t_prep = time.perf_counter()
        for ri, req in enumerate(requests):
            spk, emovec, segments = self._prepare(
                req["spk_audio_prompt"], req.get("emo_audio_prompt"),
                req.get("emo_alpha", 1.0), req.get("emo_vector"),
                req.get("use_emo_text", False), req.get("emo_text"),
                req.get("use_random", False), req["text"],
                req.get("max_text_tokens_per_segment", 120),
                req.get("more_segment_before",
                        req.get("quick_streaming_tokens", 0)))
            prepared.append((req, spk, emovec, segments))
            for si, seg in enumerate(segments):
                jobs.append({"req": ri, "seg": si, "tokens": seg,
                             "spk": spk, "emovec": emovec})
        timers = {"gpt_gen_time": 0.0,
                  "prepare_time": time.perf_counter() - t_prep}

        self._run_segment_jobs(jobs, cfg.generation, timers)
        logger.info(
            "infer_batch: %d req / %d jobs — prepare %.2f s, decode %.2f s, "
            "synthesis %.2f s", len(requests), len(jobs),
            timers["prepare_time"], timers["gpt_gen_time"],
            timers.get("synthesis_time", 0.0))

        # --- reassemble per request
        results: List[InferenceResult] = []
        total = time.perf_counter() - start
        for ri, (req, spk, emovec, segments) in enumerate(prepared):
            wavs = [j["wav"] for j in sorted(
                (j for j in jobs if j["req"] == ri), key=lambda j: j["seg"])]
            full = post.insert_interval_silence(
                wavs, cfg.engine.sample_rate, req.get("interval_silence", 200))
            wav_len = len(full) / cfg.engine.sample_rate
            metrics = {"inference_time": total, "audio_length": wav_len,
                       "rtf": total / wav_len if wav_len > 0 else 0.0}
            results.append(InferenceResult(full.astype(np.int16),
                                           cfg.engine.sample_rate, metrics))
        return results

    def _should_batch_segments(self, segments: List[List[str]], gen) -> bool:
        """Route a multi-segment `infer` to the batched job machinery only
        when the batched decode is estimated faster than decoding the
        segments sequentially.

        Decode wall is weight-DMA-dominated, so per-step cost is nearly
        batch-size-independent within each kernel class; what differs is the
        per-token cost of the class (v5e measurements, STATUS.md): fused
        batch-1 megakernel 0.70 ms/token, batched megakernel ~0.85, XLA
        batched decode 1.81.  Sequential decode pays its per-token rate on
        the SUM of segment lengths; batched pays its rate on the MAX.
        """
        if not self.cfg.engine.batch_segments or len(segments) <= 1:
            return False
        lens = [len(s) for s in segments]  # codes scale ~linearly with text
        if gen.num_beams > 1:
            # per-request beam and vmapped-batch beam are the same kernel
            # class either way -> batching wins whenever max < sum
            return True
        fused_single = self.fused_pack is not None
        fused_batch = fused_single and self.cfg.engine.use_fused_batch_decode
        r_seq = 0.70 if fused_single else 1.81
        r_bat = 0.85 if fused_batch else 1.81
        return r_bat * max(lens) < r_seq * sum(lens)

    def _run_segment_jobs(self, jobs: List[dict], gen,
                          timers: Optional[dict] = None) -> None:
        """Run decode + synthesis for a list of segment jobs, sub-batched by
        shape bucket (shared by `infer_batch` and multi-segment `infer`).

        Each job needs {"tokens", "spk", "emovec"} and gains
        {"ids", "bucket", "codes", "code_len", "cbucket", "wav"}.
        """
        cfg = self.cfg
        batch_cap = max(1, cfg.server.max_batch_size)

        # --- group jobs by text bucket, decode in sub-batches
        t0 = time.perf_counter()
        by_bucket: Dict[int, List[dict]] = {}
        for job in jobs:
            ids = self.tokenizer.convert_tokens_to_ids(job["tokens"])
            job["ids"] = ids
            bucket = post.pick_bucket(len(ids), cfg.engine.text_buckets)
            job["bucket"] = bucket
            by_bucket.setdefault(bucket, []).append(job)

        for bucket, group in by_bucket.items():
            for ofs in range(0, len(group), batch_cap):
                sub = group[ofs:ofs + batch_cap]
                self._decode_jobs(sub, bucket, gen)
        if timers is not None:
            timers["gpt_gen_time"] += time.perf_counter() - t0
            t0 = time.perf_counter()

        # --- group by code bucket for s2mel/vocoder
        by_cbucket: Dict[int, List[dict]] = {}
        for job in jobs:
            by_cbucket.setdefault(job["cbucket"], []).append(job)
        for cbucket, group in by_cbucket.items():
            for ofs in range(0, len(group), batch_cap):
                self._mel_jobs(group[ofs:ofs + batch_cap], cbucket)
        if timers is not None:
            timers["synthesis_time"] = (timers.get("synthesis_time", 0.0)
                                        + time.perf_counter() - t0)

    def _beam_fused_pack(self):
        """The megakernel pack for beam decode, when enabled and available."""
        if (self.cfg.engine.use_fused_beam_decode
                and self.cfg.generation.num_beams <= 8):
            return self.fused_pack
        return None

    @staticmethod
    def _batch_bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def _beam_jobs_fused(self, jobs, gen, cond, emo, text, lens, sub,
                         max_new=None):
        """Decode beam-K jobs on the megakernel, REQUEST-BATCHED.

        Round 4 decoded beam jobs sequentially ("beams ride the megakernel
        one request at a time"), so a c16 burst at the production beam-3
        default degraded to worse-than-serial (server bench: aggregate RTF
        0.2804 vs the sampling path's 0.0628).  `beam_decode_fused_batch`
        packs R requests x K beams into one R*K-row kernel whose weight
        stream — the dominant decode cost — is read once per step for all
        R requests.  Chunks of `engine.beam_batch_rows // K` requests,
        padded to a power of 2 so distinct group sizes share compiled
        graphs; a single job (or K > 4, which the ancestor table cannot
        serve) keeps the historical single-request path and RNG stream.
        """
        e = self.cfg.engine
        pack = self._beam_fused_pack()
        k = gen.num_beams
        n = len(jobs)
        if max_new is None:
            max_new = gen.max_mel_tokens
        r_cap = (max(1, getattr(e, "beam_batch_rows", 8) // k)
                 if (pack is not None and k <= 4) else 1)
        # chunk in POWER-OF-2 request counts: the tail chunk pads rn up to
        # the next pow2, so a non-pow2 r_cap (e.g. 12 rows // 4 beams = 3)
        # would pad past the kernel's row cap — clamp the chunk size to the
        # largest pow2 <= r_cap instead
        while r_cap & (r_cap - 1):
            r_cap &= r_cap - 1

        def run_single(i, key):
            return beam_decode(
                self.params_gpt_rt, self.gpt, gen, cond[i:i + 1],
                emo[i:i + 1], jnp.asarray(text[i:i + 1]),
                jnp.asarray(lens[i:i + 1]), key,
                max_new=max_new, fused_pack=pack,
                int8_kv=e.use_int8_kv, int4_expand=e.int4_expand,
                merge_stages=e.merge_decode_stages,
                readout_pack=self.readout_pack)

        if n == 1:
            # single-job calls keep the historical RNG stream (sub directly);
            # fold_in only differentiates true multi-job runs
            return run_single(0, sub)
        results = []
        i = 0
        while i < n:
            rn = min(r_cap, n - i)
            if rn == 1:
                results.append(run_single(i, jax.random.fold_in(sub, i)))
                i += 1
                continue
            rb = 1 << (rn - 1).bit_length()   # pow2 pad bounds graph count
            rows = list(range(i, i + rn)) + [i] * (rb - rn)
            idx = jnp.asarray(rows)
            keys = jnp.stack([jax.random.fold_in(sub, j) for j in rows])
            res = beam_decode_fused_batch(
                self.params_gpt_rt, self.gpt, gen,
                jnp.take(cond, idx, axis=0), jnp.take(emo, idx, axis=0),
                jnp.asarray(text[rows]), jnp.asarray(lens[rows]), keys,
                max_new=max_new, fused_pack=pack,
                int8_kv=e.use_int8_kv, int4_expand=e.int4_expand,
                merge_stages=e.merge_decode_stages,
                readout_pack=self.readout_pack)
            results.append(DecodeResult(res.codes[:rn], res.lengths[:rn],
                                        res.hit_limit[:rn]))
            i += rn
        return DecodeResult(
            jnp.concatenate([r.codes for r in results]),
            jnp.concatenate([r.lengths for r in results]),
            jnp.concatenate([r.hit_limit for r in results]))

    def _decode_cap(self, bucket: int, gen) -> int:
        """Decode-length cap for a text bucket's job group.

        The production cap is max_mel_tokens=1500 (the reference default),
        but a 1500-cap beam cache makes every 20-char request pay a
        1792-position cache prefill + per-step ancestor-table traffic.
        `auto_code_bucket` sizes the cap from the TEXT BUCKET (not the true
        text length, so the (text bucket -> cap) map is a function and the
        compile-variant count stays at one per text bucket) with the same
        codes-per-token margin the fused pipeline uses; any row that hits
        the estimated cap is re-decoded once at the full production cap
        (`_decode_jobs` retry), so output is unaffected.

        The estimate also LEARNS: `_observe_code_len` keeps the longest
        decode length seen per text bucket, and the cap never drops below
        it — so a systematically under-shooting static estimate (e.g.
        random weights, where decode runs to the cap every time) stops
        paying the doomed low-cap attempt after the first hits.  Boot
        warmup performs the learning before /health goes ready."""
        cfg = self.cfg
        if not cfg.engine.auto_code_bucket:
            return gen.max_mel_tokens
        est = int(cfg.engine.codes_per_text_token * bucket) + 16
        est = max(est, self._cap_hint.get(bucket, 0) + 1)
        cap = post.pick_bucket(min(est, gen.max_mel_tokens),
                               self._code_buckets())
        return min(cap, gen.max_mel_tokens)

    def _observe_code_len(self, bucket: int, lengths, hit, cap: int,
                          gen) -> None:
        """Record the longest observed decode length for a text bucket.

        Rows that hit a REDUCED cap are about to retry at the full cap —
        count them as full-cap-length so the next group skips the doomed
        attempt immediately (the retry's own observation would say the
        same one group later).  The hint DECAYS 5% per observation group,
        so one pathological max-length request raises the bucket's cap
        only temporarily (~30 groups) instead of forever — retries are
        expensive enough that the bias stays conservative."""
        full = gen.max_mel_tokens
        now = 0
        for i in range(len(lengths)):
            n = int(lengths[i])
            if hit[i] and cap < full:
                n = full
            now = max(now, min(n, full))
        old = self._cap_hint.get(bucket, 0)
        self._cap_hint[bucket] = max(now, int(old * 0.95))

    def _decode_jobs(self, jobs: List[dict], bucket: int, gen,
                     force_full_cap: bool = False) -> None:
        cfg = self.cfg
        max_new = (gen.max_mel_tokens if force_full_cap
                   else self._decode_cap(bucket, gen))
        # pad the batch to a power-of-2 bucket so distinct group sizes don't
        # each compile a fresh decode graph
        b = self._batch_bucket(len(jobs))
        text = np.zeros((b, bucket), np.int32)
        lens = np.ones((b,), np.int32)
        for i, job in enumerate(jobs):
            ids = job["ids"][:bucket]
            text[i, :len(ids)] = ids
            lens[i] = len(ids)
        def padded_cat(rows):
            rows = rows + [rows[0]] * (b - len(rows))
            return jnp.concatenate(rows, axis=0)

        cond = padded_cat([j["spk"]["cond_latents"] for j in jobs])
        emo = padded_cat([j["emovec"] for j in jobs])
        self._rng, sub = jax.random.split(self._rng)
        if gen.num_beams <= 1:
            res = gpt_decode(self.params_gpt_rt, self.gpt, gen, cond, emo,
                             jnp.asarray(text), jnp.asarray(lens), sub,
                             max_new=max_new,
                             fused_pack=self.fused_pack,
                             int8_kv=self.cfg.engine.use_int8_kv,
                             int4_expand=self.cfg.engine.int4_expand,
                             merge_stages=self.cfg.engine.merge_decode_stages,
                             fused_batch=self.cfg.engine.use_fused_batch_decode,
                             readout_pack=self.readout_pack)
        elif len(jobs) == 1 or self._beam_fused_pack() is not None:
            res = self._beam_jobs_fused(jobs, gen, cond, emo, text, lens, sub,
                                        max_new)
        else:
            res = beam_decode_batch(self.params_gpt_rt, self.gpt, gen, cond,
                                    emo, jnp.asarray(text), jnp.asarray(lens),
                                    sub, max_new=max_new)
        codes_np, lengths_np, hit = self._fetch_decode(res)
        self._observe_code_len(bucket, lengths_np[:len(jobs)], hit, max_new,
                               gen)
        # rows that hit an ESTIMATED cap re-decode once at the full cap
        retry = [i for i in range(len(jobs))
                 if hit[i] and max_new < gen.max_mel_tokens]
        if retry:
            self._decode_jobs([jobs[i] for i in retry], bucket, gen,
                              force_full_cap=True)
        for i, job in enumerate(jobs):
            if i in retry:
                continue
            code_len = max(int(lengths_np[i] - (0 if hit[i] else 1)), 1)
            row, row_len = post.remove_long_silence(
                codes_np[i:i + 1, :code_len], np.asarray([code_len]),
                cfg.gpt.stop_mel_token, cfg.engine.silent_token)
            job["codes"] = row[0]
            job["code_len"] = int(row_len[0])
            job["cbucket"] = post.pick_bucket(job["code_len"],
                                              self._code_buckets())
            job["text_row"] = text[i]
            job["text_len"] = int(lens[i])

    def _mel_jobs(self, jobs: List[dict], cbucket: int) -> None:
        cfg = self.cfg
        b = self._batch_bucket(len(jobs))
        tbucket = post.pick_bucket(max(j["bucket"] for j in jobs),
                                   cfg.engine.text_buckets)
        text = np.zeros((b, tbucket), np.int32)
        tlens = np.ones((b,), np.int32)
        codes = np.zeros((b, cbucket), np.int32)
        clens = np.ones((b,), np.int32)
        for i, job in enumerate(jobs):
            text[i, :len(job["text_row"])] = job["text_row"][:tbucket]
            tlens[i] = job["text_len"]
            codes[i, :job["code_len"]] = job["codes"][:job["code_len"]]
            clens[i] = job["code_len"]
        def padded_cat(rows, axis=0):
            rows = rows + [rows[0]] * (b - len(rows))
            return jnp.concatenate(rows, axis=axis)

        cond = padded_cat([j["spk"]["cond_latents"] for j in jobs])
        emo = padded_cat([j["emovec"] for j in jobs])

        pbuckets = tuple(x for x in cfg.engine.prompt_frame_buckets
                         if x < self.prompt_mel_frames) + (self.prompt_mel_frames,)
        pbucket = post.pick_bucket(max(j["spk"]["mel_frames"] for j in jobs),
                                   pbuckets)
        prompt_condition = padded_cat(
            [j["spk"]["prompt_condition"][:, :pbucket] for j in jobs])
        ref_mel = padded_cat(
            [j["spk"]["ref_mel"][:, :, :pbucket] for j in jobs])
        style = padded_cat([j["spk"]["style"] for j in jobs])
        mel_frames = jnp.asarray(
            [j["spk"]["mel_frames"] for j in jobs]
            + [jobs[0]["spk"]["mel_frames"]] * (b - len(jobs)))

        # split stage graphs (NOT the fused synth_chain): the three calls
        # chain asynchronously with a single sync at the wav fetch anyway,
        # and fusing here would compile one big graph per
        # (batch, text, code, prompt, mel)-bucket combination instead of
        # three small per-stage products
        latent = self._gpt_latent(self.params_gpt_rt, cond, emo,
                                  jnp.asarray(text), jnp.asarray(tlens),
                                  jnp.asarray(codes), jnp.asarray(clens))
        mbucket = self._mel_bucket_for(cbucket)
        self._rng, sub = jax.random.split(self._rng)
        mel, target_len = self._s2mel_chain(
            self.params_s2mel_rt, self.params["repcodec"], latent,
            jnp.asarray(codes), jnp.asarray(clens), prompt_condition,
            mel_frames, ref_mel, style, sub, cbucket, mbucket)
        wav = np.asarray(self._vocode(self.params_voc_rt, mel))
        tls = np.asarray(target_len)
        hop = cfg.mel.hop_size
        for i, job in enumerate(jobs):
            job["wav"] = wav[i].reshape(-1)[: int(tls[i]) * hop]

    def _synthesize_segment(self, seg_tokens: List[str], spk: dict,
                            emovec: jnp.ndarray, timers: dict, verbose: bool,
                            generation_kwargs: dict) -> np.ndarray:
        cfg = self.cfg
        gen = self._generation_config(generation_kwargs)

        ids = self.tokenizer.convert_tokens_to_ids(seg_tokens)
        text_len = len(ids)
        bucket = post.pick_bucket(text_len, cfg.engine.text_buckets)
        text = np.zeros((1, bucket), np.int32)
        text[0, :text_len] = ids[:bucket]

        # --- whole-segment fused pipeline (decode -> trim -> synthesis in
        # one dispatch, one transfer). The code bucket is static per dispatch,
        # so it can't come from the actual decoded length without a mid-
        # pipeline host sync; by default it is estimated from the text length
        # (decode KV cache + CFM/vocoder all scale with it), with ONE retry at
        # the full max_mel_tokens bucket if the decode hit the estimated cap
        if cfg.engine.fuse_pipeline and gen.num_beams <= 1:
            t0 = time.perf_counter()
            full_cbucket = post.pick_bucket(gen.max_mel_tokens,
                                            self._code_buckets())
            if cfg.engine.auto_code_bucket:
                est = int(text_len * cfg.engine.codes_per_text_token) + 16
                # adaptive floor: never re-attempt below a length this text
                # bucket has already been observed to exceed
                est = max(est, self._cap_hint.get(bucket, 0) + 1)
                cbucket = post.pick_bucket(min(est, gen.max_mel_tokens),
                                           self._code_buckets())
            else:
                cbucket = full_cbucket
            pbuckets = tuple(b for b in cfg.engine.prompt_frame_buckets
                             if b < self.prompt_mel_frames) \
                + (self.prompt_mel_frames,)
            pbucket = post.pick_bucket(spk["mel_frames"], pbuckets)
            self._rng, sub_d = jax.random.split(self._rng)
            self._rng, sub_s = jax.random.split(self._rng)
            while True:
                out = self._segment_pipeline(
                    self.params_gpt_rt, (self.fused_pack,
                                         self.spec_draft_pack,
                                         self.readout_pack),
                    self.params_s2mel_rt,
                    self.params["repcodec"], self.params_voc_rt,
                    spk["cond_latents"], emovec, jnp.asarray(text),
                    jnp.asarray([min(text_len, bucket)]),
                    spk["prompt_condition"][:, :pbucket],
                    jnp.asarray([spk["mel_frames"]]),
                    spk["ref_mel"][:, :, :pbucket], spk["style"],
                    jnp.stack([sub_d, sub_s]), gen, cbucket,
                    self._mel_bucket_for(cbucket),
                    min(cbucket, gen.max_mel_tokens))
                arr = np.asarray(out)
                hit_limit = bool(arr[0, -1, 2])
                if hit_limit and cbucket < full_cbucket:
                    # learn: this bucket's requests outrun the estimate
                    self._observe_code_len(bucket, [cbucket], [True],
                                           cbucket, gen)
                if not (hit_limit and cbucket < full_cbucket):
                    break
                # estimate too small for this segment: re-run at the full
                # bucket (same rng keys -> identical decode prefix)
                cbucket = full_cbucket
            n_frames = int(arr[0, -1, 0])
            # observe the (post-trim, frame-derived) decode length on
            # SUCCESS too — without it the cap hint recorded by a single
            # cap-hit would never see the shorter observations that drive
            # its decay, pinning the bucket at the full cap forever
            obs_codes = max(1, int(math.ceil(
                n_frames / max(self.cfg.s2mel.mel_scale_factor, 1e-6))))
            self._observe_code_len(bucket, [obs_codes], [False], cbucket,
                                   gen)
            wav_np = arr[0, :-1].reshape(-1)
            timers["pipeline_time"] = (timers.get("pipeline_time", 0.0)
                                       + time.perf_counter() - t0)
            return wav_np[: n_frames * self.cfg.mel.hop_size]

        # --- GPT AR decode (beam path when num_beams > 1, reference default 3)
        t0 = time.perf_counter()
        self._rng, sub = jax.random.split(self._rng)

        def run_decode(max_new):
            if gen.num_beams <= 1:
                if (self.cfg.engine.spec_decode_k >= 2
                        and self.spec_draft_pack is not None):
                    return spec_decode(
                        self.params_gpt_rt, self.gpt, gen,
                        spk["cond_latents"], emovec, jnp.asarray(text),
                        jnp.asarray([min(text_len, bucket)]), sub,
                        max_new=max_new, pack_target=self.fused_pack,
                        pack_draft=self.spec_draft_pack,
                        k_spec=self.cfg.engine.spec_decode_k,
                        int4_expand=self.cfg.engine.int4_expand,
                        merge_stages=self.cfg.engine.merge_decode_stages)
                return gpt_decode(
                    self.params_gpt_rt, self.gpt, gen,
                    spk["cond_latents"], emovec, jnp.asarray(text),
                    jnp.asarray([min(text_len, bucket)]), sub,
                    max_new=max_new,
                    fused_pack=self.fused_pack,
                    int8_kv=self.cfg.engine.use_int8_kv,
                    int4_expand=self.cfg.engine.int4_expand,
                    merge_stages=self.cfg.engine.merge_decode_stages,
                    readout_pack=self.readout_pack)
            return beam_decode(self.params_gpt_rt, self.gpt, gen,
                               spk["cond_latents"], emovec, jnp.asarray(text),
                               jnp.asarray([min(text_len, bucket)]), sub,
                               max_new=max_new,
                               fused_pack=self._beam_fused_pack(),
                               int8_kv=self.cfg.engine.use_int8_kv,
                               int4_expand=self.cfg.engine.int4_expand,
                               merge_stages=self.cfg.engine.merge_decode_stages,
                               readout_pack=self.readout_pack)

        # text-bucket-sized decode cap with ONE full-cap retry on hit (same
        # estimate/retry contract as the fused pipeline and `_decode_jobs`)
        cap = self._decode_cap(bucket, gen)
        res = run_decode(cap)
        codes_np, lengths_np, hit_limit = self._fetch_decode(res)
        self._observe_code_len(bucket, lengths_np[:1], hit_limit, cap, gen)
        if hit_limit[0] and cap < gen.max_mel_tokens:
            res = run_decode(gen.max_mel_tokens)
            codes_np, lengths_np, hit_limit = self._fetch_decode(res)
        timers["gpt_gen_time"] += time.perf_counter() - t0

        # stop token excluded from the code sequence unless the row never
        # produced one (reference `infer_v2.py:676-687`)
        code_len = int(lengths_np[0] - (0 if hit_limit[0] else 1))
        code_len = max(code_len, 1)
        codes_np, code_lens = post.remove_long_silence(
            codes_np[:, :code_len], np.asarray([code_len]),
            cfg.gpt.stop_mel_token, cfg.engine.silent_token)
        code_len = int(code_lens[0])

        cbucket = post.pick_bucket(code_len, self._code_buckets())
        # pad with 0 (an ordinary code): the teacher-forced forward replaces
        # positions past code_len with the stop token itself, and the s2mel
        # regulator never gathers past code_len — while the stop token id is
        # out of range for the semantic codebook lookup
        codes = np.zeros((1, cbucket), np.int32)
        codes[0, :code_len] = codes_np[0, :code_len]

        mbucket = self._mel_bucket_for(cbucket)
        # slice the prompt to its frame bucket: DiT attention cost scales with
        # (prompt + generated)^2, so short prompts shouldn't pay for 15 s
        pbuckets = tuple(b for b in cfg.engine.prompt_frame_buckets
                         if b < self.prompt_mel_frames) + (self.prompt_mel_frames,)
        pbucket = post.pick_bucket(spk["mel_frames"], pbuckets)
        prompt_condition = spk["prompt_condition"][:, :pbucket]
        ref_mel = spk["ref_mel"][:, :, :pbucket]
        self._rng, sub = jax.random.split(self._rng)

        if cfg.engine.fuse_synthesis:
            # one dispatch + one host transfer for latent+s2mel+vocoder;
            # per-stage breakdown is only available with fuse_synthesis=False
            t0 = time.perf_counter()
            wav, target_len = self._synth_chain(
                self.params_gpt_rt, self.params_s2mel_rt,
                self.params["repcodec"], self.params_voc_rt,
                spk["cond_latents"], emovec, jnp.asarray(text),
                jnp.asarray([min(text_len, bucket)]), jnp.asarray(codes),
                jnp.asarray([code_len]), prompt_condition,
                jnp.asarray([spk["mel_frames"]]), ref_mel, spk["style"], sub,
                cbucket, mbucket)
            wav_np = np.asarray(wav)[0].reshape(-1)
            timers["synthesis_time"] = (timers.get("synthesis_time", 0.0)
                                        + time.perf_counter() - t0)
        else:
            # --- teacher-forced latent
            t0 = time.perf_counter()
            latent = self._gpt_latent(
                self.params_gpt_rt, spk["cond_latents"], emovec,
                jnp.asarray(text), jnp.asarray([min(text_len, bucket)]),
                jnp.asarray(codes), jnp.asarray([code_len]))
            jax.block_until_ready(latent)
            timers["gpt_forward_time"] += time.perf_counter() - t0

            # --- s2mel
            t0 = time.perf_counter()
            mel, target_len = self._s2mel_chain(
                self.params_s2mel_rt, self.params["repcodec"], latent,
                jnp.asarray(codes), jnp.asarray([code_len]),
                prompt_condition, jnp.asarray([spk["mel_frames"]]),
                ref_mel, spk["style"], sub, cbucket, mbucket)
            jax.block_until_ready(mel)
            timers["s2mel_time"] += time.perf_counter() - t0

            # --- vocoder
            t0 = time.perf_counter()
            wav = self._vocode(self.params_voc_rt, mel)
            wav_np = np.asarray(wav)[0].reshape(-1)
            timers["bigvgan_time"] += time.perf_counter() - t0

        n_frames = int(np.asarray(target_len)[0])
        hop = self.cfg.mel.hop_size
        return wav_np[: n_frames * hop]
