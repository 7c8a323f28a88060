"""Attention seq2seq decoding — batched autoregressive beam search.

Decode side of ``model = seq2seq`` (models/seq2seq.py). The reference has
no sequence decoder at all (reference nnet.py:246-289 emits per-frame
likelihoods); this is the label-synchronous counterpart of the
transducer's frame-synchronous beam (decode/transducer_beam.py).

Step-synchronous batched beam as ONE jitted program: at step s every
live hypothesis has emitted exactly s tokens, so the whole beam advances
in lockstep — a ``lax.scan`` over steps whose body scores a
``[B, K, V+1]`` candidate matrix (column 0 = a finished hypothesis
holding, columns 1..V = extending with a label; emitting EOS marks the
hypothesis finished without storing a token) and prunes with
``lax.top_k``. The lockstep structure means two distinct hypotheses can
never hold the same token sequence (actives all have length s; a prefix's
length is fixed), so no merge pass is needed — unlike the transducer
lattice, where many alignments share one label sequence.

The decoder prefix is re-run in full each step (the causal
``decode_step_logits`` grid, logits gathered at each row's own length) —
O(L²) in decode length but every step is one big static-shape batched
matmul program, no per-hypothesis host work. Hypotheses still active at
the step cap take a final EOS scoring so every returned score is a
complete-sequence log-probability; ranking applies the standard
``(5+len)/(5+1)`` GNMT length penalty when ``length_penalty > 0``.

Semantics pinned against an independent host oracle and the teacher-
forced forward (tests/test_seq2seq.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.models.seq2seq import AttentionSeq2Seq

_NEG = -1e30


class Seq2SeqBeamDecoder:
    """Batched attention beam search emitting text transcriptions.

    ``beam_width`` hypotheses per utterance; ``max_tokens`` caps the
    decode length; ``length_penalty`` α > 0 ranks by
    ``score / ((5 + len) / 6)^α`` (GNMT), 0 ranks raw scores (the
    default — short-utterance ASR rarely needs it, and raw scores keep
    beam-1 == greedy exactly).
    """

    def __init__(
        self,
        model: AttentionSeq2Seq,
        params,
        model_state,
        coder,
        *,
        beam_width: int = 4,
        max_tokens: int = 100,
        length_penalty: float = 0.0,
        fusion_table=None,  # decode/lm.py::DenseFusionTable
    ):
        if beam_width < 1:
            raise ValueError("beam_width must be >= 1")
        self.model = model
        self.params = params
        self.model_state = model_state
        self.coder = coder
        self.beam = int(beam_width)
        self.max_tokens = int(max_tokens)
        self.length_penalty = float(length_penalty)
        # shallow fusion: the table's columns must cover every emittable
        # id — the labels plus the EOS column (built with "</s>")
        self.fusion = fusion_table
        if fusion_table is not None and \
                fusion_table.table.shape[1] != model.vocab_size:
            raise ValueError(
                "attention fusion table needs one column per emittable "
                f"id incl. EOS: got {fusion_table.table.shape[1]}, want "
                f"{model.vocab_size} (build with column_tokens = alphabet "
                "+ ['</s>'])"
            )
        self._lm_table = (
            None if fusion_table is None else jnp.asarray(fusion_table.table)
        )
        self._fn = jax.jit(self._search)

    def _search(self, params, inputs, lengths):
        model, k, L = self.model, self.beam, self.max_tokens
        memory, _ = model.encode(
            params, self.model_state, inputs, lengths, train=False
        )  # [B, T', D]
        b, t, d = memory.shape
        v_total = model.vocab_size
        eos = model.sos_eos_id
        mem_valid = (
            jnp.arange(t)[None, :] < model.output_lengths(lengths)[:, None]
        )
        # cross-attention K/V computed ONCE from the memory, then
        # broadcast so beams ride the batch axis: [blocks, B*K, T', D]
        cross_k, cross_v = model.cross_kv(params, memory)
        nb = cross_k.shape[0]
        cross_k = jnp.broadcast_to(
            cross_k[:, :, None], (nb, b, k, t, d)
        ).reshape(nb, b * k, t, d)
        cross_v = jnp.broadcast_to(
            cross_v[:, :, None], (nb, b, k, t, d)
        ).reshape(nb, b * k, t, d)
        mem_valid_k = jnp.broadcast_to(
            mem_valid[:, None], (b, k, t)
        ).reshape(b * k, t)

        buf = jnp.zeros((b, k, L), jnp.int32)
        counts = jnp.zeros((b, k), jnp.int32)
        scores = jnp.full((b, k), _NEG, jnp.float32).at[:, 0].set(0.0)
        finished = jnp.zeros((b, k), bool)
        cache = model.init_decode_cache(b * k, L)
        tok = jnp.full((b * k,), eos, jnp.int32)  # SOS at position 0

        def gather_cache(cache, parent):
            def leaf(x):  # [blocks, B*K, L+1, D]
                xk = x.reshape(nb, b, k, L + 1, d)
                idx = parent[None, :, :, None, None]
                return jnp.take_along_axis(xk, idx, axis=2).reshape(x.shape)
            return {key: leaf(val) for key, val in cache.items()}

        def step(state):
            s, tok, cache, buf, counts, scores, finished = state
            logits, cache = model.decode_step_cached(
                params, tok, s, cache, cross_k, cross_v, mem_valid_k
            )
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v_total)
            # candidates: col 0 = finished beam holds; cols 1..V = extend
            hold = jnp.where(finished, scores, _NEG)
            if self.fusion is not None:
                from tfkaldi_tpu.decode.lm import lm_extension_scores

                logp = logp + lm_extension_scores(
                    self.fusion, self._lm_table, buf, counts
                )
            extend = jnp.where(
                finished[:, :, None], _NEG, scores[:, :, None] + logp
            )
            # at the buffer cap, only EOS may be "emitted"
            at_cap = counts >= L
            label_ok = (
                (jnp.arange(v_total)[None, None, :] == eos)
                | ~at_cap[:, :, None]
            )
            extend = jnp.where(label_ok, extend, _NEG)
            cand = jnp.concatenate([hold[:, :, None], extend], axis=2)
            top_scores, flat = jax.lax.top_k(
                cand.reshape(b, k * (v_total + 1)), k
            )
            parent = flat // (v_total + 1)
            choice = flat % (v_total + 1)  # 0 = hold, 1+v = emit v
            label = jnp.maximum(choice - 1, 0).astype(jnp.int32)
            emits_eos = choice == (1 + eos)
            extends = (choice > 0) & ~emits_eos

            new_buf = jnp.take_along_axis(buf, parent[:, :, None], axis=1)
            new_counts = jnp.take_along_axis(counts, parent, axis=1)
            new_finished = (
                jnp.take_along_axis(finished, parent, axis=1) | emits_eos
            )
            # masked broadcast-compare write, NOT a scatter: a computed-index
            # .at[].set lowers to a serialized per-row scatter on TPU
            # (measured ~0.4 ms per iteration at this tiny shape); the
            # compare+where is one fused elementwise pass. Non-extending
            # rows point past the buffer → no slot matches.
            pos = jnp.where(extends, new_counts, L)
            slot = jnp.arange(L)[None, None, :] == pos[:, :, None]
            new_buf = jnp.where(slot, label[:, :, None], new_buf)
            new_counts = new_counts + extends.astype(jnp.int32)
            # beams reorder → re-gather their caches by parent; the slot
            # for position s was written during the parents' evaluation
            cache2 = gather_cache(cache, parent)
            # the token fed at position s+1 is the label just emitted
            # (garbage for held/finished rows — their logits are unused)
            return (s + 1, label.reshape(b * k), cache2, new_buf,
                    new_counts, top_scores, new_finished)

        # while_loop instead of a fixed-L scan: once every live hypothesis
        # has emitted EOS a step only re-selects the held beams (scores,
        # buffers unchanged — an exact no-op), so exiting early is
        # equivalence-preserving and saves the tail of a generous cap.
        # live = alive (not pruned to _NEG) and not yet finished.
        def cond(state):
            s, _, _, _, _, scores, finished = state
            live = (scores > _NEG / 2) & ~finished
            return (s < L) & jnp.any(live)

        s, tok, cache, buf, counts, scores, finished = jax.lax.while_loop(
            cond, step,
            (jnp.asarray(0, jnp.int32), tok, cache, buf, counts, scores,
             finished),
        )
        # close any still-open hypotheses with their EOS probability so
        # every score is a complete-sequence log-probability. Unfinished
        # rows extended every step, so their frontier is position s
        # exactly; finished rows' logits are unused.
        logits, _ = model.decode_step_cached(
            params, tok, s, cache, cross_k, cross_v, mem_valid_k
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v_total)
        if self.fusion is not None:
            # the forced closing pays the same fused </s> term the
            # in-loop EOS extensions do
            from tfkaldi_tpu.decode.lm import lm_extension_scores

            logp = logp + lm_extension_scores(
                self.fusion, self._lm_table, buf, counts
            )
        scores = jnp.where(finished, scores, scores + logp[:, :, eos])
        if self.length_penalty > 0.0:
            norm = ((5.0 + counts.astype(jnp.float32)) / 6.0) ** self.length_penalty
            ranked = scores / norm
        else:
            ranked = scores
        return buf, counts, scores, ranked

    def decode_batch_nbest(
        self, inputs, lengths
    ) -> list[list[tuple[np.ndarray, float]]]:
        """Per row: surviving hypotheses as ``(label_ids, log_score)``,
        best first (by length-penalized rank, raw scores reported)."""
        buf, counts, scores, ranked = self._fn(
            self.params, jnp.asarray(inputs), jnp.asarray(lengths, jnp.int32)
        )
        buf, counts, scores, ranked = map(
            np.asarray, (buf, counts, scores, ranked)
        )
        out = []
        for bi in range(buf.shape[0]):
            order = np.argsort(-ranked[bi], kind="stable")
            out.append([
                (buf[bi, kk, : counts[bi, kk]].astype(np.int32),
                 float(scores[bi, kk]))
                for kk in order if scores[bi, kk] > _NEG / 2
            ])
        return out

    def decode_batch(self, inputs, lengths) -> list[np.ndarray]:
        return [h[0][0] for h in self.decode_batch_nbest(inputs, lengths)]

    def decode_to_file(
        self,
        reader: FeatureReader,
        outfile: str,
        *,
        batch_size: int = 16,
        bucket_multiple: int = 128,
    ) -> int:
        """Stream the test set and write a Kaldi-style ``text`` file."""
        from tfkaldi_tpu.decode.streaming import pick_stream

        count = 0
        with open(outfile, "w") as fid:
            for utt_ids, inputs, lengths in pick_stream(reader)(
                reader, batch_size=batch_size, bucket_multiple=bucket_multiple
            ):
                for utt_id, ids in zip(utt_ids, self.decode_batch(inputs, lengths)):
                    fid.write(f"{utt_id} {self.coder.decode(ids)}\n")
                    count += 1
        return count


class CTCRescoreDecoder:
    """Two-pass decode for the joint CTC-attention model (wenet-style
    "attention rescoring"): pass 1 runs the host CTC prefix beam over the
    shared encoder's CTC head and keeps each utterance's n-best label
    sequences with their CTC log-probabilities; pass 2 scores every
    hypothesis with ONE batched teacher-forced decoder forward (all
    B·N hypotheses ride the batch axis — no autoregressive loop at all,
    the decode-side payoff of the parallel teacher-forcing design) and
    reranks by ``rescore_weight·logP_ctc + (1−rescore_weight)·logP_att``.
    Requires a model trained with ``ctc_weight > 0``.
    """

    def __init__(
        self,
        model: AttentionSeq2Seq,
        params,
        model_state,
        coder,
        *,
        beam_width: int = 10,
        rescore_weight: float = 0.5,
        max_tokens: int = 100,
    ):
        if getattr(model.config, "ctc_weight", 0.0) <= 0.0:
            raise ValueError(
                "attention rescoring needs a joint model (ctc_weight > 0)"
            )
        self.model = model
        self.params = params
        self.model_state = model_state
        self.coder = coder
        self.beam = int(beam_width)
        self.w = float(rescore_weight)
        self.max_tokens = int(max_tokens)

        def first_pass(params, inputs, lengths):
            memory, _ = model.encode(
                params, model_state, inputs, lengths, train=False
            )
            logp = jax.nn.log_softmax(
                model.ctc_logits(params, memory), axis=-1
            )
            return memory, logp

        def att_scores(params, memory_rep, mem_valid_rep, tokens, hyp_lens):
            # teacher-forced grid over [B*N, L+1]; hypothesis score =
            # sum of target log-probs (labels then EOS at hyp_lens)
            n, l1 = tokens.shape
            token_valid = (
                jnp.arange(l1)[None, :] <= hyp_lens[:, None]
            )
            logits = model.decode_step_logits(
                params, tokens, token_valid, memory_rep, mem_valid_rep,
                train=False,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            # targets: tokens shifted left, EOS at position hyp_lens
            tgt = jnp.concatenate(
                [tokens[:, 1:], jnp.zeros((n, 1), tokens.dtype)], axis=1
            )
            at_eos = jnp.arange(l1)[None, :] == hyp_lens[:, None]
            tgt = jnp.where(at_eos, model.sos_eos_id, tgt)
            nll = jnp.take_along_axis(
                logp, tgt[:, :, None].astype(jnp.int32), axis=-1
            )[..., 0]
            valid = jnp.arange(l1)[None, :] <= hyp_lens[:, None]
            return jnp.sum(nll * valid, axis=1)

        self._first = jax.jit(first_pass)
        self._score = jax.jit(att_scores)

    def decode_batch(self, inputs, lengths) -> list[np.ndarray]:
        from tfkaldi_tpu.decode.ctc_beam import (
            beam_step,
            initial_beams,
            nbest_prefixes,
        )

        model, n_best = self.model, self.beam
        inputs = jnp.asarray(inputs)
        lengths_d = jnp.asarray(lengths, jnp.int32)
        memory, ctc_logp = self._first(self.params, inputs, lengths_d)
        enc_lens = np.asarray(model.output_lengths(lengths_d))
        ctc_logp = np.asarray(ctc_logp, np.float64)
        b, t, d = memory.shape

        hyps: list[list[tuple[tuple, float]]] = []
        for row in range(b):
            beams = initial_beams()
            for tt in range(int(enc_lens[row])):
                beams = beam_step(
                    beams, ctc_logp[row, tt], model.sos_eos_id, n_best
                )
            hyps.append(nbest_prefixes(beams, n_best))

        # batch every hypothesis; pad the token axis to a bucket so the
        # jitted scorer compiles once per bucket, not per batch
        l_raw = max(
            1, min(self.max_tokens, max(len(h[0]) for row in hyps for h in row))
        )
        l_max = -(-l_raw // 8) * 8
        tokens = np.full((b, n_best, l_max + 1), model.sos_eos_id, np.int32)
        hyp_lens = np.zeros((b, n_best), np.int32)
        ctc_scores = np.full((b, n_best), -np.inf, np.float64)
        for row, row_hyps in enumerate(hyps):
            for k, (prefix, score) in enumerate(row_hyps):
                ids = list(prefix)[: l_max]
                tokens[row, k, 1 : 1 + len(ids)] = ids
                tokens[row, k, 1 + len(ids) :] = 0
                hyp_lens[row, k] = len(ids)
                ctc_scores[row, k] = score

        mem_rep = jnp.broadcast_to(
            memory[:, None], (b, n_best, t, d)
        ).reshape(b * n_best, t, d)
        mem_valid = (
            jnp.arange(t)[None, :] < jnp.asarray(enc_lens)[:, None]
        )
        mem_valid_rep = jnp.broadcast_to(
            mem_valid[:, None], (b, n_best, t)
        ).reshape(b * n_best, t)
        att = np.asarray(
            self._score(
                self.params,
                mem_rep,
                mem_valid_rep,
                jnp.asarray(tokens.reshape(b * n_best, l_max + 1)),
                jnp.asarray(hyp_lens.reshape(b * n_best), jnp.int32),
            )
        ).reshape(b, n_best)

        # unfilled slots (rows with < n_best surviving prefixes) stay -inf
        # regardless of the weights
        final = np.where(
            np.isfinite(ctc_scores),
            self.w * ctc_scores + (1.0 - self.w) * att,
            -np.inf,
        )
        out = []
        for row in range(b):
            k = int(np.argmax(final[row]))
            out.append(
                tokens[row, k, 1 : 1 + int(hyp_lens[row, k])].astype(np.int32)
            )
        return out

    def decode_to_file(
        self,
        reader: FeatureReader,
        outfile: str,
        *,
        batch_size: int = 16,
        bucket_multiple: int = 128,
    ) -> int:
        """Stream the test set and write a Kaldi-style ``text`` file."""
        from tfkaldi_tpu.decode.streaming import pick_stream

        count = 0
        with open(outfile, "w") as fid:
            for utt_ids, inputs, lengths in pick_stream(reader)(
                reader, batch_size=batch_size, bucket_multiple=bucket_multiple
            ):
                for utt_id, ids in zip(utt_ids, self.decode_batch(inputs, lengths)):
                    fid.write(f"{utt_id} {self.coder.decode(ids)}\n")
                    count += 1
        return count
