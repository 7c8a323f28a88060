"""Transducer (RNN-T) beam search — batched, fully jitted, TPU-native.

The reference has no sequence decoder at all (its decode path emits
per-frame likelihoods for Kaldi, reference nnet.py:246-289); this is the
beam-search counterpart of the greedy search in decode/transducer.py,
selected by ``beam_width > 1`` in ``[nnet]`` for ``loss = rnnt``.

Algorithm: frame-synchronous beam search with bounded per-frame expansions
and exact prefix merging (Graves 2012 semantics under the same
``max_symbols_per_frame`` bound the greedy search uses). Per encoder
frame, each of the K beams either *finishes* the frame (takes the blank —
its score is then fixed for the rest of the frame) or *extends* with one
label and keeps expanding; after S expansion steps any still-active beam
is forced to take the blank so the frame advances. Hypotheses that reach
the same label prefix by different lattice paths are true duplicates
(identical prediction-network state, identical futures), so their scores
are merged with ``logaddexp`` and the loser is retired — without this the
beam wastes slots on copies of one hypothesis.

TPU design: the whole batched search is ONE jitted program. Frames are a
``lax.scan``; the S expansion steps are an unrolled static loop whose body
is entirely vectorized over [B, K]:

- candidate scoring is a single [B, K, V+1] matrix (column 0 = finish /
  stay, columns 1..V = extend-with-label) pruned with ``lax.top_k`` over
  the flattened K·(V+1) candidates — ties break toward lower index,
  deterministically;
- beam state (scores, token buffers, prediction-network carries and
  projections) is re-gathered by parent index with ``take_along_axis``;
  the prediction network advances only for extended beams, batched over
  B·K rows through the same ``predict_step`` the greedy search uses
  (non-advancing rows keep their carry via the streaming freeze mask);
- prefix merging is a [B, K, K] exact token-buffer comparison (K is
  small); the canonical (lowest-index) duplicate absorbs the others'
  scores with one masked ``logsumexp``.

No host round-trips inside an utterance: the host reads back one
``(tokens, counts, scores)`` triple per batch. Semantics are pinned
against an independently written numpy oracle of the same algorithm and
against the greedy decoder at K = 1 (tests/test_transducer_beam.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfkaldi_tpu.data.feature_reader import FeatureReader
from tfkaldi_tpu.models.transducer import Transducer

_NEG = -1e30  # score sentinel for retired beams / illegal candidates


def _merge_equal_prefixes(scores, buf, counts, active=None):
    """Merge beams with identical label prefixes: the lowest-index copy
    absorbs the others' probability mass (logaddexp); losers drop to
    ``_NEG``. ``scores [B, K]``, ``buf [B, K, L]``, ``counts [B, K]``.

    Mid-frame (``active`` given), a finished beam sits at lattice node
    (t+1, prefix) while an active one with the same prefix is still at
    (t, prefix) — different states, different futures — so equality also
    requires matching active status; after the frame's forced blank all
    beams are at t+1 and prefix equality alone decides."""
    b, k, _ = buf.shape
    # eq[b, i, j]: beams i and j hold the same hypothesis. Buffer slots
    # past count are always zero (never written), so full-buffer equality
    # plus count equality is exact prefix equality. Retired beams (score
    # == _NEG) never participate.
    same_tokens = jnp.all(buf[:, :, None, :] == buf[:, None, :, :], axis=-1)
    same_count = counts[:, :, None] == counts[:, None, :]
    alive = scores > _NEG / 2
    eq = same_tokens & same_count & alive[:, :, None] & alive[:, None, :]
    if active is not None:
        eq &= active[:, :, None] == active[:, None, :]
    # canonical representative of j = first i with eq[i, j]
    canon = jnp.argmax(eq, axis=1)  # [B, K] (argmax → first True)
    # merged[c] = logsumexp of scores over { j : canon[j] == c }
    owns = canon[:, None, :] == jnp.arange(k)[None, :, None]  # [B, c, j]
    contrib = jnp.where(owns, scores[:, None, :], _NEG)
    merged = jax.nn.logsumexp(contrib, axis=2)
    is_canon = canon == jnp.arange(k)[None, :]
    return jnp.where(is_canon & alive, merged, jnp.where(alive, _NEG, scores))


def _beam_scan(model: Transducer, beam: int, max_symbols: int, params,
               enc, frame_valid, proj, carry, buf, counts, scores, buf_len,
               frame_buf, conf_buf, fcount, fusion=None, lm_table=None):
    """Run the frame-synchronous beam over ``enc [B, T, J]``.

    ``proj [B, K, J]``, ``carry`` leaves ``[B*K, ...]``, ``buf
    [B, K, L]``, ``counts/scores [B, K]``. Returns the advanced state.
    ``fusion``/``lm_table``: optional dense shallow-fusion LM
    (decode/lm.py::DenseFusionTable) — label extensions gain the fused
    LM term, the blank (a lattice move, not a label) does not, matching
    the CTC prefix-beam fusion semantics.

    ``frame_buf``/``conf_buf [B, K, L]`` are the label-time backtrace: in
    step with ``buf``, slot ``l`` records the GLOBAL encoder frame at
    which hypothesis ``k`` emitted its ``l``-th label, and that label's
    joint-step softmax posterior at the emission (the acoustic posterior
    — the LM fusion term scores hypotheses, not confidences). ``fcount
    [B]`` is the per-row global valid-frame counter the indices are based
    on (zeros offline; carried across chunks when streaming). Prefix
    merging leaves the canonical survivor's backtrace in place — losers
    are true duplicates of the same lattice prefix, only their
    probability mass is absorbed.
    """
    b, t, j = enc.shape
    k = beam
    v_total = model.vocab_size  # labels + blank

    def gather_carry(carry, parent):
        """Re-index the [B*K, ...] prediction carries by parent beam."""
        def leaf(x):
            xk = x.reshape((b, k) + x.shape[1:])
            idx = parent.reshape(b, k, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xk, idx, axis=1).reshape(x.shape)
        return jax.tree.map(leaf, carry)

    def frame(state, xs):
        proj, carry, buf, frame_buf, conf_buf, counts, scores, fcount, _ = state
        enc_t, valid_t = xs  # [B, J], [B]
        active = jnp.ones((b, k), bool)

        def expand(proj, carry, buf, frame_buf, conf_buf, counts, scores,
                   active, forced):
            logits = model.joint_step(
                params,
                jnp.broadcast_to(enc_t[:, None, :], (b, k, j)).reshape(b * k, j),
                proj.reshape(b * k, j),
            ).reshape(b, k, v_total)
            logp = jax.nn.log_softmax(logits, axis=-1)
            stay = jnp.where(
                active, scores + logp[:, :, model.blank_id], scores
            )  # finished beams carry their score unchanged
            if forced:
                # after S expansions every active beam must take the blank
                return (proj, carry, buf, frame_buf, conf_buf, counts, stay,
                        jnp.zeros_like(active))
            extend = scores[:, :, None] + logp  # [B, K, V]
            if fusion is not None:
                from tfkaldi_tpu.decode.lm import lm_extension_scores

                lm_add = lm_extension_scores(fusion, lm_table, buf, counts)
                extend = extend + jnp.pad(lm_add, ((0, 0), (0, 0), (0, 1)))
            # blank is not an extension; inactive/full beams cannot extend
            can_extend = active & (counts < buf_len)
            label_ok = jnp.arange(v_total)[None, None, :] != model.blank_id
            extend = jnp.where(
                can_extend[:, :, None] & label_ok, extend, _NEG
            )
            cand = jnp.concatenate([stay[:, :, None], extend], axis=2)
            top_scores, flat_idx = jax.lax.top_k(
                cand.reshape(b, k * (v_total + 1)), k
            )
            parent = flat_idx // (v_total + 1)  # [B, K]
            choice = flat_idx % (v_total + 1)  # 0 = stay, 1+v = extend v
            is_ext = choice > 0
            label = jnp.maximum(choice - 1, 0).astype(jnp.int32)

            # re-gather parent state
            new_buf = jnp.take_along_axis(buf, parent[:, :, None], axis=1)
            new_frames = jnp.take_along_axis(frame_buf, parent[:, :, None], axis=1)
            new_confs = jnp.take_along_axis(conf_buf, parent[:, :, None], axis=1)
            new_counts = jnp.take_along_axis(counts, parent, axis=1)
            new_proj = jnp.take_along_axis(proj, parent[:, :, None], axis=1)
            new_active = jnp.take_along_axis(active, parent, axis=1)
            carry = gather_carry(carry, parent)

            # the chosen extension's ACOUSTIC posterior (pre-fusion logp)
            lp_parent = jnp.take_along_axis(logp, parent[:, :, None], axis=1)
            label_conf = jnp.exp(
                jnp.take_along_axis(
                    lp_parent.astype(jnp.float32), label[:, :, None], axis=2
                )[:, :, 0]
            )

            # append labels for extended beams — a masked broadcast-compare
            # write, NOT a scatter (a computed-index .at[].set lowers to a
            # serialized per-row scatter on TPU, ~0.4 ms per iteration at
            # this shape); non-extending rows point past the buffer so no
            # slot matches
            pos = jnp.where(is_ext, new_counts, buf_len)
            slot = jnp.arange(buf_len)[None, None, :] == pos[:, :, None]
            new_buf = jnp.where(slot, label[:, :, None], new_buf)
            new_frames = jnp.where(slot, fcount[:, None, None], new_frames)
            new_confs = jnp.where(slot, label_conf[:, :, None], new_confs)
            new_counts = new_counts + is_ext.astype(jnp.int32)
            # stay-selected ACTIVE beams just took their blank → finished;
            # stay-selected finished beams remain finished
            new_active = is_ext
            # advance the prediction net for extended beams only
            adv = (is_ext & valid_t[:, None]).reshape(b * k)
            stepped, carry = model.predict_step(
                params, label.reshape(b * k), adv, carry
            )
            stepped = stepped.reshape(b, k, j)
            new_proj = jnp.where(is_ext[:, :, None], stepped, new_proj)

            merged = _merge_equal_prefixes(
                top_scores, new_buf, new_counts, new_active
            )
            return (new_proj, carry, new_buf, new_frames, new_confs,
                    new_counts, merged, new_active)

        st = (proj, carry, buf, frame_buf, conf_buf, counts, scores, active)
        for _ in range(max_symbols):
            st = expand(*st, forced=False)
        (proj2, carry2, buf2, frames2, confs2, counts2, scores2, _) = expand(
            *st, forced=True
        )
        scores2 = _merge_equal_prefixes(scores2, buf2, counts2)

        # frozen rows (past their length) keep everything
        keep = lambda new, old: jnp.where(
            jnp.reshape(valid_t, (b,) + (1,) * (new.ndim - 1)), new, old
        )
        proj = keep(proj2, proj)
        buf = keep(buf2, buf)
        frame_buf = keep(frames2, frame_buf)
        conf_buf = keep(confs2, conf_buf)
        counts = keep(counts2, counts)
        scores = keep(scores2, scores)
        carry = jax.tree.map(
            lambda n, o: jnp.where(
                jnp.repeat(valid_t, k).reshape((b * k,) + (1,) * (n.ndim - 1)),
                n, o,
            ),
            carry2, carry,
        )
        fcount = fcount + valid_t.astype(jnp.int32)
        return (proj, carry, buf, frame_buf, conf_buf, counts, scores, fcount,
                jnp.zeros((b, k), bool)), None

    init = (proj, carry, buf, frame_buf, conf_buf, counts, scores, fcount,
            jnp.zeros((b, k), bool))
    (proj, carry, buf, frame_buf, conf_buf, counts, scores, fcount, _), _ = (
        jax.lax.scan(
            frame, init,
            (jnp.transpose(enc, (1, 0, 2)), jnp.transpose(frame_valid)),
        )
    )
    return proj, carry, buf, frame_buf, conf_buf, counts, scores, fcount


class TransducerBeamDecoder:
    """Batched transducer beam search emitting text transcriptions.

    ``beam_width`` hypotheses per utterance; ``max_symbols_per_frame``
    bounds emissions per encoder frame (same guard as the greedy search).
    ``max_tokens`` caps each hypothesis' label buffer (default: one full
    T × max_symbols budget, the greedy buffer size).
    """

    def __init__(
        self,
        model: Transducer,
        params,
        model_state,
        coder,
        *,
        beam_width: int = 4,
        max_symbols_per_frame: int = 4,
        max_tokens: int | None = None,
        fusion_table=None,  # decode/lm.py::DenseFusionTable
    ):
        if beam_width < 1:
            raise ValueError("beam_width must be >= 1")
        self.model = model
        self.params = params
        self.model_state = model_state
        self.coder = coder
        self.beam = int(beam_width)
        self.max_symbols = int(max_symbols_per_frame)
        self.max_tokens = max_tokens
        self.fusion = fusion_table
        self._lm_table = (
            None if fusion_table is None else jnp.asarray(fusion_table.table)
        )
        self._fn = jax.jit(self._search)

    def _search(self, params, inputs, lengths):
        model, k = self.model, self.beam
        enc, _ = model.encode(
            params, self.model_state, inputs, lengths, train=False
        )  # [B, T', J]
        b, t, j = enc.shape
        buf_len = self.max_tokens or t * self.max_symbols

        # prime every beam with the start token; only beam 0 is live
        sos = jnp.full((b * k,), model.blank_id, jnp.int32)
        proj, carry = model.predict_step(
            params, sos, jnp.ones((b * k,), bool), model.init_pred_carry(b * k)
        )
        proj = proj.reshape(b, k, j)
        scores = jnp.full((b, k), _NEG, jnp.float32).at[:, 0].set(0.0)
        buf = jnp.zeros((b, k, buf_len), jnp.int32)
        frame_buf = jnp.zeros((b, k, buf_len), jnp.int32)
        conf_buf = jnp.zeros((b, k, buf_len), jnp.float32)
        enc_lengths = model.output_lengths(lengths)
        frame_valid = jnp.arange(t)[None, :] < enc_lengths[:, None]
        _, _, buf, frame_buf, conf_buf, counts, scores, _ = _beam_scan(
            model, k, self.max_symbols, params, enc, frame_valid,
            proj, carry, buf, jnp.zeros((b, k), jnp.int32), scores, buf_len,
            frame_buf, conf_buf, jnp.zeros((b,), jnp.int32),
            fusion=self.fusion, lm_table=self._lm_table,
        )
        return buf, frame_buf, conf_buf, counts, scores

    def decode_batch_nbest(
        self, inputs, lengths
    ) -> list[list[tuple[np.ndarray, float]]]:
        """``[B, T, F]`` padded features → per row, the surviving
        hypotheses as ``(label_ids, log_score)``, best first."""
        buf, _, _, counts, scores = self._fn(
            self.params, jnp.asarray(inputs), jnp.asarray(lengths, jnp.int32)
        )
        buf, counts, scores = map(np.asarray, (buf, counts, scores))
        out = []
        for bi in range(buf.shape[0]):
            order = np.argsort(-scores[bi], kind="stable")
            out.append([
                (buf[bi, kk, : counts[bi, kk]].astype(np.int32),
                 float(scores[bi, kk]))
                for kk in order if scores[bi, kk] > _NEG / 2
            ])
        return out

    def decode_batch(self, inputs, lengths) -> list[np.ndarray]:
        """``[B, T, F]`` padded features → best-hypothesis label ids."""
        return [h[0][0] for h in self.decode_batch_nbest(inputs, lengths)]

    def decode_batch_aligned(
        self, inputs, lengths
    ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """``[B, T, F]`` padded features → per row the BEST hypothesis'
        label-time backtrace ``(ids, frames, posteriors)``: the encoder
        frame whose joint step emitted each label, and the label's
        softmax posterior at that emission (acoustic, pre-fusion)."""
        buf, frame_buf, conf_buf, counts, scores = self._fn(
            self.params, jnp.asarray(inputs), jnp.asarray(lengths, jnp.int32)
        )
        buf, frame_buf, conf_buf, counts, scores = map(
            np.asarray, (buf, frame_buf, conf_buf, counts, scores)
        )
        out = []
        for bi in range(buf.shape[0]):
            kk = int(np.argmax(scores[bi]))
            n = int(counts[bi, kk])
            out.append((
                buf[bi, kk, :n].astype(np.int32),
                frame_buf[bi, kk, :n].astype(np.int64),
                conf_buf[bi, kk, :n].astype(np.float64),
            ))
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


class OnlineTransducerBeamDecoder:
    """Streaming transducer beam search for unidirectional encoders.

    Frame-synchronous beam search is strictly causal — every frame's
    expansion depends only on past frames — so carrying the beam state
    (scores, buffers, prediction carries) across chunks makes the chunked
    search EQUAL to :class:`TransducerBeamDecoder` on the concatenated
    features, at any chunking (pinned by tests/test_transducer_beam.py).
    Unlike greedy streaming, already-emitted labels are not final: the
    best hypothesis can change as frames arrive, so ``best()`` returns
    the current best prefix rather than a stable append-only stream.
    """

    def __init__(self, model: Transducer, params, model_state, *,
                 beam_width: int = 4, max_symbols_per_frame: int = 4,
                 max_tokens: int = 1024, fusion_table=None):
        model.validate_streamable()
        self.model = model
        self.params = params
        self.beam = int(beam_width)
        self.max_symbols = int(max_symbols_per_frame)
        self.max_tokens = int(max_tokens)
        self.fusion = fusion_table
        lm_table = (
            None if fusion_table is None else jnp.asarray(fusion_table.table)
        )
        self._state = None

        model_ = model

        def compute(params, chunk, lengths, enc_carry, proj, pred_carry,
                    buf, frame_buf, conf_buf, counts, scores, fcount):
            enc, n_out, enc_carry = model_.encode_stream(
                params, model_state, chunk, lengths, enc_carry
            )
            valid = jnp.arange(enc.shape[1])[None, :] < n_out[:, None]
            (proj, pred_carry, buf, frame_buf, conf_buf, counts, scores,
             fcount) = _beam_scan(
                model_, self.beam, self.max_symbols, params, enc, valid,
                proj, pred_carry, buf, counts, scores, self.max_tokens,
                frame_buf, conf_buf, fcount,
                fusion=self.fusion, lm_table=lm_table,
            )
            return (enc_carry, proj, pred_carry, buf, frame_buf, conf_buf,
                    counts, scores, fcount)

        def flush(params, enc_carry, proj, pred_carry, buf, frame_buf,
                  conf_buf, counts, scores, fcount):
            enc, n, enc_carry = model_.encode_stream_flush(
                params, model_state, enc_carry
            )
            valid = jnp.arange(enc.shape[1])[None, :] < n[:, None]
            (proj, pred_carry, buf, frame_buf, conf_buf, counts, scores,
             fcount) = _beam_scan(
                model_, self.beam, self.max_symbols, params, enc, valid,
                proj, pred_carry, buf, counts, scores, self.max_tokens,
                frame_buf, conf_buf, fcount,
                fusion=self.fusion, lm_table=lm_table,
            )
            return (enc_carry, proj, pred_carry, buf, frame_buf, conf_buf,
                    counts, scores, fcount)

        self._fn = jax.jit(compute)
        self._flush_fn = jax.jit(flush)
        self._init_fn = jax.jit(
            lambda params, sos, adv, carry: model_.predict_step(
                params, sos, adv, carry
            )
        )

    def _fresh_state(self, batch_size: int):
        b, k = batch_size, self.beam
        j = self.model.config.joint_units
        proj, pred_carry = self._init_fn(
            self.params,
            jnp.full((b * k,), self.model.blank_id, jnp.int32),
            jnp.ones((b * k,), bool),
            self.model.init_pred_carry(b * k),
        )
        return (
            self.model.encoder.init_stream_carry(b),
            proj.reshape(b, k, j),
            pred_carry,
            jnp.zeros((b, k, self.max_tokens), jnp.int32),
            jnp.zeros((b, k, self.max_tokens), jnp.int32),  # frame backtrace
            jnp.zeros((b, k, self.max_tokens), jnp.float32),  # posteriors
            jnp.zeros((b, k), jnp.int32),
            jnp.full((b, k), _NEG, jnp.float32).at[:, 0].set(0.0),
            jnp.zeros((b,), jnp.int32),  # global valid-frame counter
        )

    def reset(self, batch_size: int) -> None:
        self._state = self._fresh_state(batch_size)

    def step(self, chunk, lengths) -> list[np.ndarray]:
        """Consume a ``[B, Tc, F]`` feature chunk; return each row's
        current-best hypothesis (full prefix, may rewrite earlier
        partials)."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before step()")
        # no np.asarray on the chunk: a device array (the fused frontend's
        # output) flows into the jitted step without a host round-trip
        if chunk.shape[1] > 0:
            self._state = self._fn(
                self.params, jnp.asarray(chunk, jnp.float32),
                jnp.asarray(lengths, jnp.int32),
                *self._state,
            )
        return self.best()

    def finish(self) -> list[np.ndarray]:
        """End the utterances: decode the subsampling front-end's final
        zero-padded partial group (no-op for RNN encoders); returns each
        row's final best hypothesis."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before finish()")
        self._state = self._flush_fn(self.params, *self._state)
        return self.best()

    # -- per-slot lifecycle (multi-stream serving) ----------------------

    def _merge_state(self, sel: np.ndarray, new_state, old_state):
        """Row-wise select over the full beam state — rows where ``sel``
        take ``new_state``."""
        mask = jnp.asarray(sel)
        mask_bk = mask[:, None]
        k = self.beam
        enc_n, proj_n, pred_n, *rest_n = new_state
        enc_o, proj_o, pred_o, *rest_o = old_state
        pred = jax.tree.map(
            lambda n, o: jnp.where(
                jnp.repeat(mask, k).reshape((n.shape[0],) + (1,) * (n.ndim - 1)),
                n, o,
            ),
            pred_n, pred_o,
        )
        merged_rest = [
            jnp.where(mask.reshape((mask.shape[0],) + (1,) * (n.ndim - 1)), n, o)
            for n, o in zip(rest_n, rest_o)
        ]
        return (
            self.model.encoder.merge_stream_carry(mask, enc_n, enc_o),
            jnp.where(mask_bk[:, :, None] if proj_n.ndim == 3 else mask_bk,
                      proj_n, proj_o),
            pred,
            *merged_rest,
        )

    def finish_rows(self, rows) -> list[np.ndarray]:
        """``finish()`` for a subset of rows: decode THEIR final partial
        group; other rows' state is untouched (the flush runs batched,
        then unselected rows' state is restored row-wise). Returns the
        full per-row best list — entries at ``rows`` are final."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before finish_rows()")
        b = self._state[1].shape[0]
        sel = np.zeros((b,), bool)
        sel[np.asarray(list(rows), np.int64)] = True
        old = self._state
        new = self._flush_fn(self.params, *old)
        self._state = self._merge_state(sel, new, old)
        return self.best()

    def reset_rows(self, rows) -> None:
        """Re-arm a subset of rows for new utterances; other rows keep
        streaming."""
        if self._state is None:
            raise RuntimeError("call reset(batch_size) before reset_rows()")
        b = self._state[1].shape[0]
        sel = np.zeros((b,), bool)
        sel[np.asarray(list(rows), np.int64)] = True
        self._state = self._merge_state(sel, self._fresh_state(b), self._state)

    def best(self) -> list[np.ndarray]:
        """Current best hypothesis per row."""
        _, _, _, buf, _, _, counts, scores, _ = self._state
        buf, counts, scores = map(np.asarray, (buf, counts, scores))
        out = []
        for bi in range(buf.shape[0]):
            kk = int(np.argmax(scores[bi]))
            out.append(buf[bi, kk, : counts[bi, kk]].astype(np.int32))
        return out

    def best_alignment(self) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-row ``(ids, frames, posteriors)`` backtrace of the CURRENT
        best hypothesis: the global encoder frame (valid frames since
        reset) whose joint step emitted each label, and the label's
        acoustic softmax posterior at that emission. Like ``best()``, the
        whole triple can be rewritten as frames arrive; after ``finish()``
        it is the final backtrace, equal to
        ``TransducerBeamDecoder.decode_batch_aligned`` on the
        concatenated features at any chunking."""
        _, _, _, buf, frame_buf, conf_buf, counts, scores, _ = self._state
        buf, frame_buf, conf_buf, counts, scores = map(
            np.asarray, (buf, frame_buf, conf_buf, counts, scores)
        )
        out = []
        for bi in range(buf.shape[0]):
            kk = int(np.argmax(scores[bi]))
            n = int(counts[bi, kk])
            out.append((
                buf[bi, kk, :n].astype(np.int32),
                frame_buf[bi, kk, :n].astype(np.int64),
                conf_buf[bi, kk, :n].astype(np.float64),
            ))
        return out
