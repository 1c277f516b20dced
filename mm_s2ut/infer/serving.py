"""Continuous-batching beam-decode serving loop.

The BASELINE north star names "continuous batching" for device-side
decode serving; fairseq-generate (the reference's only inference driver,
scripts/textless/2_inference.sh) can't do it — a batch's fast finishers
wait for its slowest member. Here the decode batch is a pool of SLOTS:
when an utterance finishes, its slot is refilled from the request queue
at the next chunk boundary while the other slots keep decoding, so the
chip never idles on drained slots.

TPU-native design (everything jit-compiled at fixed shapes):

  * the self-attention cache keeps the offline layout
    (B, L, H, T_ring·K, 2·Dh) but the flattened time axis is a RING:
    every active slot writes its new K/V rows at the SAME physical ring
    position (the global counter g mod T_ring) — one aligned in-place
    dynamic_update_slice per step, identical to offline decode — while
    each slot's *logical* time is its own local_step. Per-slot validity
    and beam ancestry are resolved entirely by the ancestry-mask
    (flat_rep) that the fused decode-attention kernel already consumes
    (UnitDecoder.serve_step), so continuous batching costs NOTHING on
    the hot path: no per-slot scatter, no cache rewrites on admit.
  * admission happens between jitted decode CHUNKS (``chunk`` steps per
    dispatch): finished slots are detected on host, their hypotheses
    emitted, new requests' encoder outputs written into the slot's
    cross-attention cache by a jitted admit function (leading-axis
    where-merge), and per-slot search state reset by the same masks.
  * per-slot beam search state mirrors infer/beam_search.py exactly
    (2K candidate scoring, EOS finalization, length-normalized scores,
    early-uninprovable detection) — batched over slots with per-slot
    step counts; a slot reaching its ``max_len = a·src + b`` budget is
    forced to EOS, matching fairseq's SequenceGenerator semantics.

Results are bit-identical to offline ``beam_search`` per utterance (the
test asserts it): chunking and slot sharing change scheduling, not math.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Shared with offline beam search: the module's correctness contract is
# bit-identity with infer/beam_search per utterance, so the scoring
# constants must be the same objects, not copies that can drift.
from mm_s2ut.infer.beam_search import NEG_INF, _length_norm


@dataclasses.dataclass
class Request:
    """One utterance to decode. ``features``/``length`` feed the encoder;
    ``imgs``/``img_masks`` are optional image-source tuples."""

    uid: Any
    features: np.ndarray  # (T, F)
    length: int
    imgs: Tuple[np.ndarray, ...] = ()
    img_masks: Tuple[np.ndarray, ...] = ()


@dataclasses.dataclass
class Result:
    uid: Any
    tokens: List[int]  # best hypothesis, EOS/pad stripped
    score: float


class ContinuousServer:
    """Slot-pool beam-decode server around an MMS2UTModel.

    ``run(requests)`` consumes an iterable of :class:`Request` and
    returns :class:`Result` per request (arbitrary completion order).
    """

    def __init__(
        self,
        model,
        params,
        *,
        slots: int = 8,
        beam_size: int = 5,
        ring: int = 256,
        chunk: int = 16,
        enc_frames: int = 1024,
        eos_id: int = 2,
        bos_id: int = 2,
        pad_id: int = 1,
        vocab_size: int = 1004,
        len_penalty: float = 1.0,
        max_len_a: float = 1.0,
        max_len_b: int = 200,
        n_img_sources: int = 0,
        img_shapes: Tuple[Tuple[int, int], ...] = (),
        kv_cache_dtype: str = "bfloat16",
        admit_width: Optional[int] = None,
        enc_feat_dim: Optional[int] = 80,
        sync_every: int = 1,
    ):
        if max_len_b >= ring:
            raise ValueError("ring must exceed max_len_b (no wrap within one utterance)")
        if kv_cache_dtype == "int4":
            # Half-split nibble packing needs an even ring so step writes
            # never straddle the packed half boundary (models/decoder.py).
            ring += ring % 2
        self.model = model
        self.params = params
        self.B, self.K = slots, beam_size
        self.ring, self.chunk = ring, chunk
        self.enc_frames = enc_frames
        self.eos, self.bos, self.pad = eos_id, bos_id, pad_id
        self.V = vocab_size
        self.len_penalty = len_penalty
        self.max_len_a, self.max_len_b = max_len_a, max_len_b
        self.img_shapes = tuple(img_shapes)[:n_img_sources] if n_img_sources else ()
        self.kv_cache_dtype = kv_cache_dtype
        # Source layout: (T, enc_feat_dim) feature frames (the flagship
        # fbank frontend), or raw (T,) waveform when enc_feat_dim is None
        # (wav2vec2/XM-style encoders consume audio directly).
        self.enc_feat_dim = enc_feat_dim
        # Admission batch width: encode/transfer only this many rows per
        # admission wave instead of the whole slot pool. Host→device
        # transfer per refill then scales with the refill count, not with
        # ``slots`` (at slots=128 a full-pool wave re-ships ~21 MB of
        # features + any image sources to admit a single drained slot).
        self.A = min(slots, admit_width) if admit_width else slots
        # Fetch only every Nth chunk's packed report. Through the device
        # tunnel the report fetch costs ~60 ms of RTT regardless of chunk
        # size (measured: per-chunk drain cost barely moved between
        # chunk=16 and chunk=8) while the decode steps themselves are
        # ~0.75 ms — so skipping fetches trades a small refill delay
        # (finishers are detected up to N·chunk steps late; the slot
        # idles frozen meanwhile) for removing the dominant fixed cost.
        # Safe because the per-slot ``finished`` flag is LEVEL-triggered
        # in-program: it stays set from self-freeze until re-admission,
        # so any later report still names every unclaimed finisher.
        self.sync_every = max(1, sync_every)
        self._decode_chunk = jax.jit(self._decode_chunk_impl)
        self._admit = jax.jit(self._admit_impl)
        self._encode = jax.jit(self._encode_impl)
        # The hot admission path: encode + scatter in ONE dispatch. Each
        # jitted call through the device tunnel costs a host round-trip
        # of dispatch latency; at admit_width=8 a 512-request workload
        # pays 64 waves, so halving per-wave dispatches is material
        # (the separate _encode/_admit stay for tests and direct use).
        self._admit_encoded = jax.jit(self._admit_encoded_impl)

    # -- jitted pieces -------------------------------------------------------

    def _encode_impl(self, params, feats, lengths, imgs, img_masks):
        # Positional prefix shared by MMS2UTModel.encode and
        # MMXMTransformerModel.encode; model-specific trailing args
        # (tgt_speaker / apply_mask) keep their defaults.
        enc = self.model.apply(
            params, feats, lengths, imgs, img_masks,
            deterministic=True, method=self.model.encode,
        )
        return enc["encoder_out"], enc["encoder_padding_mask"]

    def init_state(self, params) -> Dict[str, Any]:
        """All-idle server state (cross caches sized from a dummy encode)."""
        B, K, T = self.B, self.K, self.ring
        fshape = (
            (B, self.enc_frames) if self.enc_feat_dim is None
            else (B, self.enc_frames, self.enc_feat_dim)
        )
        feats = jnp.zeros(fshape, jnp.float32)
        lengths = jnp.full((B,), self.enc_frames, jnp.int32)
        imgs = tuple(jnp.zeros((B, t, d), jnp.float32) for t, d in self.img_shapes)
        masks = tuple(jnp.zeros((B, t), bool) for t, d in self.img_shapes)
        enc_out, enc_mask = self._encode(params, feats, lengths, imgs, masks)
        dec = self.model.apply(
            params, {"encoder_out": enc_out, "encoder_padding_mask": enc_mask,
                     "encoder_states": []},
            T, method=self.model.decode_init,
            kv_dtype=self.kv_cache_dtype,
        )
        kv = dec["self_kv"]
        shape = list(kv.shape)
        # Tile the physical flattened axis by the slot count — for the
        # int4 nibble-packed cache that axis is T/2, not T.
        shape[3] = kv.shape[3] * K
        scale_pool = {}
        for key in ("self_kv_sk", "self_kv_sv"):
            if key in dec:
                s_shape = list(dec[key].shape)
                s_shape[3] = dec[key].shape[3] * K
                scale_pool[key] = jnp.zeros(s_shape, dec[key].dtype)
        state = {
            **dec,
            **scale_pool,
            "self_kv": jnp.zeros(shape, kv.dtype),
            "ancestry": jnp.zeros((B, K, T), jnp.int32),
            "g": jnp.zeros((), jnp.int32),
            "local_step": jnp.zeros((B,), jnp.int32),
            "ring_base": jnp.zeros((B,), jnp.int32),
            # search state
            "alive_seq": jnp.full((B, K, T), self.pad, jnp.int32),
            "alive_logp": jnp.full((B, K), NEG_INF, jnp.float32),
            "fin_seq": jnp.full((B, K, T), self.pad, jnp.int32),
            "fin_scores": jnp.full((B, K), NEG_INF, jnp.float32),
            "fin_flags": jnp.zeros((B, K), bool),
            "slot_max": jnp.zeros((B,), jnp.int32),
            "active": jnp.zeros((B,), bool),
            # Level-triggered finisher flag: set when a slot self-freezes,
            # cleared on re-admission — so a report fetched chunks later
            # still names every finisher the host hasn't claimed yet.
            "finished": jnp.zeros((B,), bool),
        }
        del state["step"]
        return state

    def _admit_impl(self, params, state, slot_idx, valid, enc_out, enc_mask,
                    src_lengths):
        """Scatter freshly encoded utterances into admitted slots and reset
        their search state; other slots untouched.

        ``enc_out``/``enc_mask`` carry an admission batch of width A ≤ B
        (``admit_width``); ``slot_idx`` (A,) names the target slot of each
        row and ``valid`` (A,) masks padding rows. Invalid rows scatter at
        index B, which ``mode="drop"`` discards."""
        A = slot_idx.shape[0]
        K, T = self.K, self.ring
        idx = jnp.where(valid, slot_idx, self.B)

        def scat(old, new):
            return old.at[idx].set(new.astype(old.dtype), mode="drop")

        # Re-derive cross K/V + bias for the admission batch, scatter rows.
        # kv_dtype must match init_state: a float re-derivation would
        # promote the quantized cross cache on merge (dropping the int8
        # bandwidth win and recompiling _decode_chunk after first admit).
        dec = self.model.apply(
            params,
            {"encoder_out": enc_out, "encoder_padding_mask": enc_mask,
             "encoder_states": []},
            T, method=self.model.decode_init,
            kv_dtype=self.kv_cache_dtype,
        )

        cross = [
            {
                # Scatter every per-slot array (kv + quantization scales);
                # "index" is a shared scalar cursor, take the new one.
                **{key: scat(o[key], n[key]) for key in o if key != "index"},
                "index": n["index"],
            }
            for o, n in zip(state["cross"], dec["cross"])
        ]
        cross_bias = state["cross_bias"]
        if cross_bias is not None:
            cross_bias = scat(cross_bias, dec["cross_bias"])

        alive_seq0 = (
            jnp.full((A, K, T), self.pad, jnp.int32).at[:, :, 0].set(self.bos)
        )
        alive_logp0 = jnp.tile(
            jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32)[None], (A, 1)
        )
        # Budget from RAW source frames (the Request.length domain), like
        # the offline UnitGenerator._max_len — the encoder mask is
        # conv-subsampled (4x for the flagship), which would force EOS
        # ~4x early under max_len_a > 0.
        slot_max = jnp.minimum(
            (self.max_len_a * src_lengths + self.max_len_b).astype(jnp.int32),
            T - 2,
        )
        return {
            **state,
            "cross": cross,
            "cross_bias": cross_bias,
            "ancestry": scat(state["ancestry"], jnp.zeros((A, K, T), jnp.int32)),
            "local_step": scat(state["local_step"], jnp.zeros((A,), jnp.int32)),
            "ring_base": scat(
                state["ring_base"],
                jnp.broadcast_to(jnp.mod(state["g"], T), (A,)),
            ),
            "alive_seq": scat(state["alive_seq"], alive_seq0),
            "alive_logp": scat(state["alive_logp"], alive_logp0),
            "fin_seq": scat(
                state["fin_seq"], jnp.full((A, K, T), self.pad, jnp.int32)
            ),
            "fin_scores": scat(
                state["fin_scores"], jnp.full((A, K), NEG_INF, jnp.float32)
            ),
            "fin_flags": scat(state["fin_flags"], jnp.zeros((A, K), bool)),
            "slot_max": scat(state["slot_max"], slot_max),
            "active": state["active"].at[idx].set(True, mode="drop"),
            "finished": state["finished"].at[idx].set(False, mode="drop"),
        }

    def _admit_encoded_impl(self, params, state, slot_idx, valid, feats,
                            lengths, imgs, img_masks):
        enc_out, enc_mask = self._encode_impl(params, feats, lengths, imgs,
                                              img_masks)
        return self._admit_impl(params, state, slot_idx, valid, enc_out,
                                enc_mask, lengths)

    def _decode_chunk_impl(self, params, state):
        """Run ``chunk`` decode steps; per-slot beam search semantics."""
        B, K, V, T = self.B, self.K, self.V, self.ring

        def body(_, st):
            local = st["local_step"]  # (B,)
            prev_tok = jnp.take_along_axis(
                st["alive_seq"], local[:, None, None], axis=2
            ).reshape(B * K, 1)
            logits, st = self.model.apply(
                params, prev_tok, st, method=self.model.serve_step
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(B, K, V)
            # Force EOS for slots at their length budget (fairseq
            # SequenceGenerator max-len semantics).
            at_budget = (local + 1) >= st["slot_max"]  # (B,)
            eos_only = jnp.full((V,), NEG_INF, jnp.float32).at[self.eos].set(0.0)
            logp = jnp.where(at_budget[:, None, None], eos_only[None, None], logp)

            cand = st["alive_logp"][:, :, None] + logp
            # Exact two-stage top-2K (see infer/beam_search.py): per-beam
            # top-k1 over V, then top-2K over the K·k1 pool — identical
            # selection, much shorter TPU sort rows. k1 = min(2K, V) keeps
            # small vocabs valid (a beam contributes at most V candidates).
            k1 = min(2 * K, V)
            s1, i1 = jax.lax.top_k(cand, k1)  # (B, K, k1)
            top_scores, pidx = jax.lax.top_k(s1.reshape(B, k1 * K), 2 * K)
            top_beam = pidx // k1
            top_tok = jnp.take_along_axis(i1.reshape(B, k1 * K), pidx, axis=1)

            seq2k = jnp.take_along_axis(st["alive_seq"], top_beam[..., None], axis=1)
            # per-slot write position local+1 (one-hot merge, (B,2K,T))
            pos = jnp.arange(T, dtype=jnp.int32)[None, None, :]
            at_next = pos == (local + 1)[:, None, None]
            seq2k = jnp.where(at_next, top_tok[..., None].astype(jnp.int32), seq2k)
            is_eos = top_tok == self.eos

            norm = _length_norm(local + 1, self.len_penalty)[:, None]
            cand_fin_scores = jnp.where(is_eos, top_scores / norm, NEG_INF)
            all_fin_seq = jnp.concatenate([st["fin_seq"], seq2k], axis=1)
            all_fin_scores = jnp.concatenate([st["fin_scores"], cand_fin_scores], axis=1)
            all_fin_flags = jnp.concatenate(
                [st["fin_flags"], jnp.logical_and(is_eos, st["active"][:, None])], axis=1
            )
            new_fin_scores, fin_top = jax.lax.top_k(all_fin_scores, K)
            new_fin_seq = jnp.take_along_axis(all_fin_seq, fin_top[..., None], axis=1)
            new_fin_flags = jnp.take_along_axis(all_fin_flags, fin_top, axis=1)

            alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
            new_alive_logp, alive_top = jax.lax.top_k(alive_cand, K)
            new_alive_seq = jnp.take_along_axis(seq2k, alive_top[..., None], axis=1)
            src_beam = jnp.take_along_axis(top_beam, alive_top, axis=1)

            # Ancestry update at the PHYSICAL ring position just written
            # (g advanced inside serve_step → the row is at g-1 mod T).
            anc = jnp.take_along_axis(st["ancestry"], src_beam[..., None], axis=1)
            wrote = jnp.mod(st["g"] - 1, T)
            pos_t = jnp.arange(T, dtype=jnp.int32)[None, None, :]
            anc = jnp.where(
                pos_t == wrote, src_beam[..., None].astype(anc.dtype), anc
            )
            return {
                **st,
                "alive_seq": new_alive_seq,
                "alive_logp": new_alive_logp,
                "fin_seq": new_fin_seq,
                "fin_scores": new_fin_scores,
                "fin_flags": new_fin_flags,
                "ancestry": anc,
            }

        state = jax.lax.fori_loop(0, self.chunk, body, state)
        # Per-slot done: all K finished AND no alive hypothesis can beat
        # the worst finished one (same improvability rule as offline).
        best_alive = state["alive_logp"][:, 0] / _length_norm(
            state["slot_max"], self.len_penalty
        )
        worst_fin = jnp.where(state["fin_flags"], state["fin_scores"], NEG_INF).min(axis=1)
        done = jnp.logical_and(
            state["active"],
            jnp.logical_or(
                jnp.logical_and(state["fin_flags"].all(axis=1), best_alive <= worst_fin),
                state["local_step"] >= state["slot_max"] + 1,
            ),
        )
        # Self-deactivation: a done slot freezes IN-PROGRAM (the offline
        # early-exit rule means nothing can change its finished set), so
        # the host never ships a deactivation mask back. Admission
        # re-arms the slot. ``finished`` latches until re-admission so
        # reports are level-triggered (see sync_every).
        state = {
            **state,
            "active": jnp.logical_and(state["active"], ~done),
            "finished": jnp.logical_or(state["finished"], done),
            "alive_logp": jnp.where(
                done[:, None], NEG_INF, state["alive_logp"]
            ),
        }
        # ONE packed device→host report per chunk: [top-beam rows |
        # finished | score bits] as (B, ring+2) int32. Separate fetches
        # each paid a full relay round-trip (~25 ms); the loop's per-chunk
        # host cost is this single transfer (or none, when sync_every
        # skips the fetch).
        packed = jnp.concatenate(
            [
                state["fin_seq"][:, 0],
                state["finished"][:, None].astype(jnp.int32),
                jax.lax.bitcast_convert_type(
                    state["fin_scores"][:, 0], jnp.int32
                )[:, None],
            ],
            axis=1,
        )
        return state, packed

    # -- host loop -----------------------------------------------------------

    def run(self, requests: Iterable[Request]) -> List[Result]:
        """Double-buffered chunk loop: chunk N+1 is DISPATCHED before the
        host syncs on chunk N's done flags, so the ~25 ms dev-tunnel RTT
        plus finisher processing overlap device execution instead of
        serializing with it (the round-4 loop paid one RTT per chunk —
        PLAN.md "serving vs static" cause 2). JAX's async dispatch keeps
        the device queue fed; the only per-iteration sync is on the
        PREVIOUS chunk's (B,) done vector.

        Correctness under pipelining: the in-flight chunk was dispatched
        before the previous chunk's finishers were drained, so it steps
        finished slots one extra chunk — harmless, because the done
        criterion is the offline early-exit rule (no candidate can enter
        the finished set once it holds), so extra steps never change the
        emitted hypothesis. A per-slot generation counter guards against
        emitting a REFILLED slot from a stale done flag (the stale chunk
        still reports the old utterance done after its slot was reused).
        """
        import time as _time

        queue = list(requests)
        queue.reverse()  # pop from the end
        results: List[Result] = []
        # Host-side phase attribution for the last run (seconds + counts):
        # stage = numpy fill + transfer dispatch, admit = fused
        # encode+scatter dispatches, decode = chunk dispatches, drain =
        # blocking fetch of the previous chunk's packed report.
        self.stats = {"stage_s": 0.0, "admit_s": 0.0, "decode_s": 0.0,
                      "drain_s": 0.0, "waves": 0, "chunks": 0}
        state = self.init_state(self.params)
        slot_uid: List[Optional[Any]] = [None] * self.B
        gen = [0] * self.B  # bumped on every admission into the slot

        A = self.A
        fshape = (
            (A, self.enc_frames) if self.enc_feat_dim is None
            else (A, self.enc_frames, self.enc_feat_dim)
        )

        def stage_next():
            """Pop the next ≤A requests and START their host→device
            feature transfer now, so the ~MBs ride the tunnel while the
            device decodes the current chunk instead of stalling the
            next admission (the transfer was the last serial per-wave
            cost once drains were packed). Queue order is preserved —
            staged requests are simply the next ones to admit.

            Buffers are allocated FRESH per wave: on the CPU backend
            jnp.asarray may zero-copy alias host memory, so reusing one
            numpy buffer across waves let a later fill mutate an earlier
            wave's in-flight device array under the pipelined dispatch
            (caught by tests/test_serving.py score equality)."""
            if not queue:
                return None
            feats_buf = np.zeros(fshape, np.float32)
            len_buf = np.zeros((A,), np.int32)
            img_bufs = [
                np.zeros((A, t, d), np.float32) for t, d in self.img_shapes
            ]
            img_mask_bufs = [np.ones((A, t), bool) for t, d in self.img_shapes]
            reqs = []
            for a in range(A):
                if not queue:
                    break
                req = queue.pop()
                reqs.append(req)
                Tq = min(req.features.shape[0], self.enc_frames)
                feats_buf[a] = 0.0
                feats_buf[a, :Tq] = req.features[:Tq]
                len_buf[a] = min(req.length, self.enc_frames)
                for i, (t, d) in enumerate(self.img_shapes):
                    img_bufs[i][a] = 0.0
                    img_mask_bufs[i][a] = True
                    if i < len(req.imgs):
                        ti = min(req.imgs[i].shape[0], t)
                        img_bufs[i][a, :ti] = req.imgs[i][:ti]
                        img_mask_bufs[i][a, :ti] = (
                            req.img_masks[i][:ti]
                            if i < len(req.img_masks) else False
                        )
            return {
                "reqs": reqs,
                "feats": jnp.asarray(feats_buf),
                "lens": jnp.asarray(len_buf),
                "imgs": tuple(jnp.asarray(x) for x in img_bufs),
                "masks": tuple(jnp.asarray(x) for x in img_mask_bufs),
                "admitted": 0,
            }

        staged = stage_next()

        def admit_waves(state, staged):
            while staged is not None:
                reqs = staged["reqs"]
                pending = len(reqs) - staged["admitted"]
                free = [b for b in range(self.B) if slot_uid[b] is None]
                if pending > 0 and not free:
                    break
                slot_idx = np.zeros((A,), np.int32)
                valid = np.zeros((A,), bool)
                for a in range(staged["admitted"], len(reqs)):
                    if not free:
                        break
                    b = free.pop(0)
                    req = reqs[a]
                    slot_uid[b] = req.uid
                    gen[b] += 1
                    slot_idx[a], valid[a] = b, True
                    staged["admitted"] = a + 1
                t0 = _time.perf_counter()
                state = self._admit_encoded(
                    self.params, state, jnp.asarray(slot_idx),
                    jnp.asarray(valid), staged["feats"], staged["lens"],
                    staged["imgs"], staged["masks"],
                )
                self.stats["admit_s"] += _time.perf_counter() - t0
                self.stats["waves"] += 1
                if staged["admitted"] < len(reqs):
                    break  # partial wave: rest admits when slots free up
                t0 = _time.perf_counter()
                staged = stage_next()
                self.stats["stage_s"] += _time.perf_counter() - t0
            return state, staged

        T_ring = self.ring

        def drain(packed_dev, dispatch_gen):
            """Sync on a completed chunk's packed report (ONE fetch:
            top-beam rows + done flags + score bits) and emit finishers.
            Done slots already froze themselves inside the chunk program
            (self-deactivation), so nothing is shipped back."""
            t0 = _time.perf_counter()
            packed = np.asarray(packed_dev)
            self.stats["drain_s"] += _time.perf_counter() - t0
            done = packed[:, T_ring] != 0
            if done.any():
                fin_scores = packed[:, T_ring + 1].view(np.float32)
                for b in np.nonzero(done)[0]:
                    if slot_uid[b] is None or dispatch_gen[b] != gen[b]:
                        continue  # already emitted / slot since refilled
                    toks = [int(t) for t in packed[b, :T_ring]]
                    # strip BOS, cut at EOS
                    toks = toks[1:]
                    if self.eos in toks:
                        toks = toks[: toks.index(self.eos)]
                    results.append(
                        Result(slot_uid[b], toks, float(fin_scores[b]))
                    )
                    slot_uid[b] = None

        inflight = None  # (packed_dev, dispatch_gen)
        it = 0
        while queue or staged is not None or any(
            u is not None for u in slot_uid
        ):
            state, staged = admit_waves(state, staged)
            t0 = _time.perf_counter()
            state, packed_dev = self._decode_chunk(self.params, state)
            self.stats["decode_s"] += _time.perf_counter() - t0
            self.stats["chunks"] += 1
            it += 1
            # Fetch only every sync_every-th report; skipped reports are
            # simply dropped (their device buffers are never transferred).
            # The level-triggered ``finished`` column makes any later
            # report a superset of the skipped ones' unclaimed finishers.
            if inflight is not None and it % self.sync_every == 0:
                drain(*inflight)
            inflight = (packed_dev, list(gen))
        if inflight is not None:
            drain(*inflight)
        return results
