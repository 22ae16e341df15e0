"""Continuous batching: requests join a RUNNING decode batch mid-flight.

The reference serializes whole requests behind a per-worker mutex
(`server.py:25,384`); `engine.infer_batch` already improves on that by
stepping request groups together, but a group must decode to completion
before the next admission — a request arriving mid-group waits out the whole
decode.  This module removes that barrier with slot-based scheduling:

- a fixed pool of B decode slots shares one time-major KV cache
  (L, 2, B, Tmax, D) and steps through `ops.fused_decode_step_batch` with
  PER-ROW positions (each slot attends its own live [0, pos_b) prefix);
- `admit` prefills a new request's prompt straight into a free slot while
  the other slots keep their state;
- `run_chunk` advances all slots K steps in ONE dispatch (the host syncs
  once per chunk — critical on remote-attached chips where every sync is a
  round trip), then the host harvests finished slots and refills them.

Completed segments drain into the engine's existing batched s2mel/vocoder
stages (`engine._mel_jobs`).  Greedy codes are bit-identical to
`models.gpt.decode.decode` (same kernels, same logit pipeline) —
`tests/test_continuous.py`.
"""

from __future__ import annotations

import functools
import queue as queue_mod
import threading
import time
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.config import GenerationConfig, GPTConfig
from voice_tts_tpu.engine import post
from voice_tts_tpu.models.gpt.decode import sample_token
from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice, n_cond_latents
from voice_tts_tpu.ops.fused_decode import (BLOCK_T, apply_kv_update_q_rows,
                                            apply_kv_update_rows,
                                            cache_to_time_major,
                                            quantize_kv_cache_batch,
                                            fused_decode_step_batch)


class SlotState(NamedTuple):
    """Device-resident decode state for B slots (None kv_scales = float KV).

    `pos` doubles as the occupancy marker: 0 = idle slot (steps compute
    NaN-free garbage there and `active` masks every state update)."""

    cache: jnp.ndarray             # (L, 2, B, Tmax, D) float or int8
    kv_scales: Optional[jnp.ndarray]  # (L, B, Tmax, 2) f32 when int8
    bias: jnp.ndarray              # (B, Tmax) f32 additive prompt mask
    pos: jnp.ndarray               # (B,) i32 live prefix length
    steps: jnp.ndarray             # (B,) i32 codes emitted
    token: jnp.ndarray             # (B,) i32 last sampled code
    presence: jnp.ndarray          # (B, V) bool repetition-penalty memory
    codes: jnp.ndarray             # (B, max_new) i32
    active: jnp.ndarray            # (B,) bool decoding now
    finished: jnp.ndarray          # (B,) bool stop token or cap hit
    hit_limit: jnp.ndarray         # (B,) bool stopped by cap, not stop token


def init_state(cfg: GPTConfig, slots: int, t_max: int, max_new: int,
               cache_dtype, int8_kv: bool) -> SlotState:
    l, d = cfg.layers, cfg.model_dim
    if int8_kv:
        cache = jnp.zeros((l, 2, slots, t_max, d), jnp.int8)
        scales = jnp.full((l, slots, t_max, 2), 1e-12, jnp.float32)
    else:
        cache = jnp.zeros((l, 2, slots, t_max, d), cache_dtype)
        scales = None
    return SlotState(
        cache=cache, kv_scales=scales,
        bias=jnp.zeros((slots, t_max), jnp.float32),
        pos=jnp.zeros((slots,), jnp.int32),
        steps=jnp.zeros((slots,), jnp.int32),
        token=jnp.zeros((slots,), jnp.int32),
        presence=jnp.zeros((slots, cfg.number_mel_codes), bool),
        codes=jnp.full((slots, max_new), cfg.stop_mel_token, jnp.int32),
        active=jnp.zeros((slots,), bool),
        finished=jnp.zeros((slots,), bool),
        hit_limit=jnp.zeros((slots,), bool))


@functools.partial(jax.jit, static_argnames=("model", "gen"),
                   donate_argnames=("state",))
def admit(params, model: UnifiedVoice, gen: GenerationConfig,
          state: SlotState, slot: jnp.ndarray, cond: jnp.ndarray,
          emo: jnp.ndarray, text: jnp.ndarray, tlen: jnp.ndarray,
          rng: jax.Array) -> SlotState:
    """Prefill one request's prompt into slot `slot` (other slots keep their
    state untouched).  text (1, bucket) right-padded; compiles once per text
    bucket.  Samples the first code like `decode()`'s prefill epilogue."""
    cfg = model.cfg
    _, bl = text.shape
    p = n_cond_latents(cfg) + 2 + bl + 2
    param_dtype = jax.tree.leaves(params)[0].dtype
    prompt, valid_p = model.apply(
        params, cond.astype(param_dtype), emo.astype(param_dtype), text,
        tlen, method=UnifiedVoice.build_prompt)
    hd = cfg.model_dim // cfg.heads
    cache0 = jnp.zeros((cfg.layers, 2, 1, cfg.heads, hd, p + 1), prompt.dtype)
    logits0, cache1 = model.apply(params, prompt, valid_p, cache0,
                                  method=UnifiedVoice.prefill)
    tm = cache_to_time_major(cache1)            # (L, 2, 1, p+1, D)

    if state.kv_scales is not None:
        q, s = quantize_kv_cache_batch(tm)      # scales (L, 1, p+1, 2)
        cache = jax.lax.dynamic_update_slice(state.cache, q,
                                             (0, 0, slot, 0, 0))
        kv_scales = jax.lax.dynamic_update_slice(state.kv_scales, s,
                                                 (0, slot, 0, 0))
    else:
        cache = jax.lax.dynamic_update_slice(
            state.cache, tm.astype(state.cache.dtype), (0, 0, slot, 0, 0))
        kv_scales = None

    t_max = state.bias.shape[1]
    valid_row = jnp.concatenate(
        [valid_p, jnp.ones((1, t_max - p), bool)], axis=1)
    bias = jax.lax.dynamic_update_slice(
        state.bias, jnp.where(valid_row, 0.0, -1e30).astype(jnp.float32),
        (slot, 0))

    pres_row = jnp.zeros((1, cfg.number_mel_codes), bool)
    pres_row = pres_row.at[:, 1].set(True)      # HF fake input ids
    pres_row = pres_row.at[:, cfg.start_mel_token].set(True)
    tok0 = sample_token(logits0, pres_row, gen, rng)   # (1,)
    pres_row = pres_row.at[0, tok0[0]].set(True)
    presence = jax.lax.dynamic_update_slice(state.presence, pres_row,
                                            (slot, 0))

    max_new = state.codes.shape[1]
    codes_row = jnp.full((1, max_new), cfg.stop_mel_token, jnp.int32)
    codes_row = codes_row.at[0, 0].set(tok0[0])
    codes = jax.lax.dynamic_update_slice(state.codes, codes_row, (slot, 0))

    fin0 = tok0[0] == cfg.stop_mel_token
    return SlotState(
        cache=cache, kv_scales=kv_scales, bias=bias,
        pos=state.pos.at[slot].set(p + 1),
        steps=state.steps.at[slot].set(1),
        token=state.token.at[slot].set(tok0[0]),
        presence=presence, codes=codes,
        active=state.active.at[slot].set(~fin0),
        finished=state.finished.at[slot].set(fin0),
        hit_limit=state.hit_limit.at[slot].set(False))


@functools.partial(jax.jit,
                   static_argnames=("model", "gen", "k", "int4_expand",
                                    "merge_stages"),
                   donate_argnames=("state",))
def run_chunk(params, fused_pack, model: UnifiedVoice, gen: GenerationConfig,
              state: SlotState, rng: jax.Array, k: int,
              int4_expand: bool = False, merge_stages: bool | int = False):
    """Advance every slot K decode steps in one dispatch.  Idle/finished
    slots compute masked garbage (their pos/steps/codes never change; cache
    writes land inside their own row at a stale position, which the next
    admit overwrites or the per-row pos masks).  Returns (state, status)
    where status (4, B) i32 packs [active, finished, hit_limit, steps] for
    ONE host fetch per chunk."""
    cfg = model.cfg
    b = state.pos.shape[0]
    max_new = state.codes.shape[1]
    int8_kv = state.kv_scales is not None
    interp = jax.default_backend() != "tpu"

    def step(i, st):
        emb = model.apply(params, st.token, st.steps - 1,
                          method=UnifiedVoice.embed_decode_token_rows)
        hidden, kv_new = fused_decode_step_batch(
            emb, fused_pack, st.cache, st.bias, st.pos, cfg.heads,
            interpret=interp, kv_scales=st.kv_scales,
            int4_expand=int4_expand, merge_stages=merge_stages)
        if int8_kv:
            cache, scales = apply_kv_update_q_rows(st.cache, st.kv_scales,
                                                   kv_new, st.pos)
        else:
            cache = apply_kv_update_rows(st.cache, kv_new, st.pos)
            scales = None
        logits = model.apply(params, hidden, method=UnifiedVoice.readout)
        tok = sample_token(logits, st.presence, gen, jax.random.fold_in(rng, i))
        tok = jnp.where(st.active, tok, cfg.stop_mel_token)
        presence = st.presence.at[jnp.arange(b), tok].set(True)
        idx = jnp.minimum(st.steps, max_new - 1)
        old = st.codes[jnp.arange(b), idx]
        codes = st.codes.at[jnp.arange(b), idx].set(
            jnp.where(st.active, tok, old))
        newly_stop = st.active & (tok == cfg.stop_mel_token)
        adv = st.active.astype(jnp.int32)
        steps = st.steps + adv
        hit = st.active & ~newly_stop & (steps >= max_new)
        return SlotState(
            cache=cache, kv_scales=scales, bias=st.bias,
            pos=st.pos + adv, steps=steps,
            token=jnp.where(st.active, tok, st.token),
            presence=presence, codes=codes,
            active=st.active & ~newly_stop & ~hit,
            finished=st.finished | newly_stop | hit,
            hit_limit=st.hit_limit | hit)

    st = jax.lax.fori_loop(0, k, step, state)
    status = jnp.stack([st.active.astype(jnp.int32),
                        st.finished.astype(jnp.int32),
                        st.hit_limit.astype(jnp.int32), st.steps])
    return st, status


class ContinuousBatcher:
    """Host-side slot scheduler over `admit`/`run_chunk`.

    Usage (single scheduler thread; `submit` is thread-safe):

        batcher = ContinuousBatcher(engine)
        holder, ev = batcher.submit({"spk_audio_prompt": ..., "text": ...})
        batcher.run()           # or batcher.start()/stop() around submits
        ev.wait(); result = holder[0]
    """

    def __init__(self, engine, slots: Optional[int] = None,
                 chunk_steps: int = 16,
                 generation_kwargs: Optional[dict] = None):
        if engine.fused_pack is None:
            raise ValueError("continuous batching requires the decode "
                             "megakernel pack (engine.use_fused_decode)")
        cfg = engine.cfg
        self.engine = engine
        self.gen = engine._generation_config(generation_kwargs or {})
        if self.gen.num_beams > 1:
            raise ValueError("continuous batching is the sampling path "
                             "(num_beams == 1); beams use infer_batch")
        self.slots = min(slots or cfg.server.max_batch_size, 8)
        self.chunk_steps = chunk_steps
        self.max_new = self.gen.max_mel_tokens
        max_bucket = max(cfg.engine.text_buckets)
        p_max = n_cond_latents(cfg.gpt) + 2 + max_bucket + 2
        t_max = p_max + 1 + self.max_new
        t_max += (-t_max) % BLOCK_T
        self.t_max = t_max
        param_dtype = jax.tree.leaves(engine.params_gpt_rt)[0].dtype
        cache_dtype = (jnp.bfloat16 if param_dtype == jnp.bfloat16
                       else jnp.float32)
        self.state = init_state(cfg.gpt, self.slots, t_max, self.max_new,
                                cache_dtype, cfg.engine.use_int8_kv)
        self._rng = jax.random.PRNGKey(cfg.engine.seed)

        self._lock = threading.Lock()
        self._pending: List[dict] = []       # raw requests awaiting prep
        self._seg_queue: List[dict] = []     # segment jobs awaiting a slot
        self._slot_job: List[Optional[dict]] = [None] * self.slots
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # synthesis runs OFF the scheduler thread so decode chunks keep
        # dispatching while finished segments vocode (wave-A2 finding: the
        # inline harvest->synthesize->chunk cycle stalled decoding for the
        # full s2mel+vocoder latency of every finished group).  The engine's
        # host-side state (_rng splits, conditioning caches) is not
        # thread-safe, so both engine touchpoints — _prepare on the
        # scheduler thread, _mel_jobs here — serialize on _engine_lock;
        # the chunk dispatches themselves don't need it.
        self._engine_lock = threading.Lock()
        self._synth_q: "queue_mod.Queue[List[dict]]" = queue_mod.Queue()
        self._synth_thread = threading.Thread(target=self._synth_loop,
                                              daemon=True)
        self._synth_thread.start()

    # ------------------------------------------------------------------
    # submission
    # ------------------------------------------------------------------

    def submit(self, request: dict):
        """Queue one request (the `infer` keyword surface).  Returns
        (holder, event): on completion holder[0] is an InferenceResult."""
        holder: list = []
        ev = threading.Event()
        with self._lock:
            self._pending.append({"req": request, "holder": holder,
                                  "event": ev,
                                  "t0": time.perf_counter()})
        return holder, ev

    # ------------------------------------------------------------------
    # scheduler
    # ------------------------------------------------------------------

    def _split_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _prep_pending(self):
        """Turn raw requests into per-segment jobs (conditioning, tokenize).
        Runs on the scheduler thread — engine caches are not thread-safe."""
        with self._lock:
            pending, self._pending = self._pending, []
        for entry in pending:
            req = entry["req"]
            with self._engine_lock:
                spk, emovec, segments = self.engine._prepare(
                    req["spk_audio_prompt"], req.get("emo_audio_prompt"),
                    req.get("emo_alpha", 1.0), req.get("emo_vector"),
                    req.get("use_emo_text", False), req.get("emo_text"),
                    req.get("use_random", False), req["text"],
                    req.get("max_text_tokens_per_segment", 120))
            entry["segments_left"] = len(segments)
            entry["wavs"] = [None] * len(segments)
            for si, seg in enumerate(segments):
                ids = self.engine.tokenizer.convert_tokens_to_ids(seg)
                bucket = post.pick_bucket(
                    len(ids), self.engine.cfg.engine.text_buckets)
                self._seg_queue.append(
                    {"entry": entry, "seg": si, "ids": ids, "bucket": bucket,
                     "spk": spk, "emovec": emovec})

    def _admit_free_slots(self):
        for slot in range(self.slots):
            if self._slot_job[slot] is not None or not self._seg_queue:
                continue
            job = self._seg_queue.pop(0)
            bucket = job["bucket"]
            text = np.zeros((1, bucket), np.int32)
            ids = job["ids"][:bucket]
            text[0, :len(ids)] = ids
            self.state = admit(
                self.engine.params_gpt_rt, self.engine.gpt, self.gen,
                self.state, jnp.asarray(slot), job["spk"]["cond_latents"],
                job["emovec"], jnp.asarray(text),
                jnp.asarray([len(ids)]), self._split_rng())
            job["text_row"] = text[0]
            job["text_len"] = len(ids)
            self._slot_job[slot] = job

    def _harvest(self, status: np.ndarray) -> List[dict]:
        done = []
        codes_np = None
        for slot in range(self.slots):
            job = self._slot_job[slot]
            if job is None or not status[1, slot]:
                continue
            if codes_np is None:
                codes_np = np.asarray(self.state.codes)
            steps = int(status[3, slot])
            hit = bool(status[2, slot])
            code_len0 = max(steps - (0 if hit else 1), 1)
            row, row_len = post.remove_long_silence(
                codes_np[slot:slot + 1, :code_len0], np.asarray([code_len0]),
                self.engine.cfg.gpt.stop_mel_token,
                self.engine.cfg.engine.silent_token)
            job["codes"] = row[0]
            job["code_len"] = int(row_len[0])
            job["cbucket"] = post.pick_bucket(job["code_len"],
                                              self.engine._code_buckets())
            done.append(job)
            self._slot_job[slot] = None
        return done

    def _synthesize(self, jobs: List[dict]):
        """Queue harvested jobs for the synthesis worker (non-blocking)."""
        self._synth_q.put(jobs)

    def _synth_loop(self):
        while True:
            jobs = self._synth_q.get()
            try:
                self._do_synthesize(jobs)
            except Exception as e:  # noqa: BLE001 — fail those requests only
                for job in jobs:
                    entry = job["entry"]
                    if not entry["event"].is_set():
                        entry["holder"].append(e)
                        entry["event"].set()
            finally:
                self._synth_q.task_done()

    def _do_synthesize(self, jobs: List[dict]):
        by_cbucket: Dict[int, List[dict]] = {}
        for job in jobs:
            by_cbucket.setdefault(job["cbucket"], []).append(job)
        with self._engine_lock:
            for cbucket, group in by_cbucket.items():
                self.engine._mel_jobs(group, cbucket)
        for job in jobs:
            entry = job["entry"]
            entry["wavs"][job["seg"]] = job["wav"]
            entry["segments_left"] -= 1
            if entry["segments_left"] == 0:
                self._finish(entry)

    def _finish(self, entry: dict):
        from voice_tts_tpu.engine.engine import InferenceResult

        cfg = self.engine.cfg
        req = entry["req"]
        full = post.insert_interval_silence(
            entry["wavs"], cfg.engine.sample_rate,
            req.get("interval_silence", 200))
        wav_len = len(full) / cfg.engine.sample_rate
        total = time.perf_counter() - entry["t0"]
        metrics = {"inference_time": total, "audio_length": wav_len,
                   "rtf": total / wav_len if wav_len > 0 else 0.0}
        entry["holder"].append(InferenceResult(
            full.astype(np.int16), cfg.engine.sample_rate, metrics))
        entry["event"].set()

    def _idle(self) -> bool:
        with self._lock:
            no_pending = not self._pending
        return (no_pending and not self._seg_queue
                and all(j is None for j in self._slot_job)
                and self._synth_q.unfinished_tasks == 0)

    def step_once(self) -> bool:
        """One scheduler iteration.  Returns False when fully idle."""
        self._prep_pending()
        self._admit_free_slots()
        if all(j is None for j in self._slot_job):
            busy = not self._idle()
            if busy:            # only synthesis outstanding: don't busy-spin
                time.sleep(0.001)
            return busy
        self.state, status = run_chunk(
            self.engine.params_gpt_rt, self.engine.fused_pack,
            self.engine.gpt, self.gen, self.state, self._split_rng(),
            self.chunk_steps,
            int4_expand=self.engine.cfg.engine.int4_expand,
            merge_stages=self.engine.cfg.engine.merge_decode_stages)
        status_np = np.asarray(status)          # the chunk's one host sync
        done = self._harvest(status_np)
        if done:
            self._synthesize(done)
        return True

    def run(self):
        """Drain everything currently submitted (blocking)."""
        while self.step_once():
            pass
        self._synth_q.join()

    def _fail_all(self, err: Exception):
        """Complete every in-flight request with the error (holder[0] is the
        exception; callers must isinstance-check).  Keeps the scheduler
        thread alive for new submissions."""
        entries = []
        with self._lock:
            entries += self._pending
            self._pending = []
        entries += [j["entry"] for j in self._seg_queue]
        self._seg_queue = []
        entries += [j["entry"] for j in self._slot_job if j is not None]
        self._slot_job = [None] * self.slots
        for entry in {id(e): e for e in entries}.values():
            if not entry["event"].is_set():
                entry["holder"].append(err)
                entry["event"].set()

    def start(self):
        def loop():
            while not self._stop.is_set():
                try:
                    busy = self.step_once()
                except Exception as e:  # noqa: BLE001 — fail requests, stay up
                    self._fail_all(e)
                    busy = False
                if not busy:
                    time.sleep(0.002)
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None
