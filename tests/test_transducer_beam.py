"""Transducer beam search vs an independent host oracle + properties.

The oracle re-implements the frame-synchronous bounded-expansion beam
(decode/transducer_beam.py module docstring) with explicit python loops
over beam slots — same candidate layout, same stable top-k tie-break,
same canonical prefix merge — but none of the vectorized/scan machinery.
Properties: K = 1 equals the greedy decoder, widening the beam never
lowers the best score, chunked streaming equals offline at any chunking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfkaldi_tpu.decode.transducer import TransducerDecoder
from tfkaldi_tpu.decode.transducer_beam import (
    OnlineTransducerBeamDecoder,
    TransducerBeamDecoder,
)
from tfkaldi_tpu.models.transducer import Transducer, TransducerConfig

_NEG = -1e30


def tiny_model(seed=0, num_labels=4, bidirectional=False):
    cfg = TransducerConfig(
        input_dim=5, num_labels=num_labels, enc_layers=1, enc_units=8,
        enc_bidirectional=bidirectional, pred_layers=1, pred_units=6,
        embed_dim=4, joint_units=6,
    )
    model = Transducer(cfg)
    params, state = model.init(jax.random.PRNGKey(seed))
    return model, params, state


def random_batch(rng, b=3, t=9, f=5):
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    lens = rng.integers(max(2, t - 4), t + 1, (b,)).astype(np.int32)
    lens[0] = t
    return x, lens


class _IdCoder:
    def decode(self, ids):
        return " ".join(str(i) for i in np.asarray(ids))


# ---------------------------------------------------------------------------
# host oracle: explicit beam slots, python loops
# ---------------------------------------------------------------------------


def _oracle_beam(model, params, feats_row, length, k, max_symbols, buf_len):
    """Beam search over one utterance; returns (best_ids, best_score) and
    the full (tokens, score) slot list."""
    enc = np.asarray(
        model.encode(params, {}, jnp.asarray(feats_row[None]),
                     jnp.asarray([length], jnp.int32), train=False)[0]
    )[0]  # [T, J]

    def pred_step(token, carry):
        proj, new_carry = model.predict_step(
            params, jnp.asarray([token], jnp.int32),
            jnp.asarray([True]), carry,
        )
        return np.asarray(proj)[0], new_carry

    proj0, carry0 = pred_step(model.blank_id, model.init_pred_carry(1))
    # slot list, order-significant (matches the device candidate layout)
    slots = [dict(tokens=(), score=0.0, proj=proj0, carry=carry0,
                  active=True)]
    for _ in range(k - 1):
        slots.append(dict(tokens=(), score=_NEG, proj=proj0, carry=carry0,
                          active=True))

    v_total = model.vocab_size

    def logp_of(slot, enc_t):
        logits = model.joint_step(
            params, jnp.asarray(enc_t[None]), jnp.asarray(slot["proj"][None])
        )
        return np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]

    def merge(slots, use_active):
        for j in range(len(slots)):
            if slots[j]["score"] <= _NEG / 2:
                continue
            for i in range(j):
                if slots[i]["score"] <= _NEG / 2:
                    continue
                if slots[i]["tokens"] != slots[j]["tokens"]:
                    continue
                if use_active and slots[i]["active"] != slots[j]["active"]:
                    continue
                slots[i]["score"] = float(
                    np.logaddexp(slots[i]["score"], slots[j]["score"])
                )
                slots[j]["score"] = _NEG
                break
        return slots

    for t in range(int(length)):
        for s in slots:
            s["active"] = True
        for step in range(max_symbols + 1):
            forced = step == max_symbols
            cands = []  # (score, flat_index, parent, choice)
            for ki, s in enumerate(slots):
                lp = logp_of(s, enc[t]) if s["active"] else None
                stay = (
                    s["score"] + lp[model.blank_id]
                    if s["active"] else s["score"]
                )
                if forced:
                    s["score"] = stay
                    s["active"] = False
                    continue
                cands.append((stay, ki * (v_total + 1), ki, 0))
                for v in range(v_total):
                    if v == model.blank_id or not s["active"] or \
                            len(s["tokens"]) >= buf_len:
                        sc = _NEG
                    else:
                        sc = s["score"] + lp[v]
                    cands.append((sc, ki * (v_total + 1) + 1 + v, ki, 1 + v))
            if forced:
                slots = merge(slots, use_active=False)
                break
            # stable top-k: score desc, flat index asc on ties
            cands.sort(key=lambda c: (-c[0], c[1]))
            new_slots = []
            for sc, _, parent, choice in cands[:k]:
                p = slots[parent]
                if choice == 0:
                    new_slots.append(dict(
                        tokens=p["tokens"], score=sc, proj=p["proj"],
                        carry=p["carry"], active=False,
                    ))
                else:
                    v = choice - 1
                    proj, carry = pred_step(v, p["carry"])
                    new_slots.append(dict(
                        tokens=p["tokens"] + (v,), score=sc, proj=proj,
                        carry=carry, active=True,
                    ))
            slots = merge(new_slots, use_active=True)
    best = max(slots, key=lambda s: s["score"])
    return (np.asarray(best["tokens"], np.int32), best["score"],
            [(s["tokens"], s["score"]) for s in slots])


# ---------------------------------------------------------------------------


def test_beam1_equals_greedy():
    model, params, state = tiny_model(seed=0)
    rng = np.random.default_rng(1)
    x, lens = random_batch(rng)
    greedy = TransducerDecoder(model, params, state, _IdCoder())
    beam = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=1
    )
    g = greedy.decode_batch(x, lens)
    b = beam.decode_batch(x, lens)
    for gi, bi in zip(g, b):
        np.testing.assert_array_equal(gi, bi)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_host_oracle(seed):
    model, params, state = tiny_model(seed=seed)
    rng = np.random.default_rng(seed + 10)
    x, lens = random_batch(rng, b=2, t=7)
    k, s = 3, 2
    beam = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=k,
        max_symbols_per_frame=s,
    )
    nbest = beam.decode_batch_nbest(x, lens)
    for row in range(x.shape[0]):
        want_ids, want_score, _ = _oracle_beam(
            model, params, x[row], int(lens[row]), k, s,
            buf_len=x.shape[1] * s,
        )
        got_ids, got_score = nbest[row][0]
        np.testing.assert_array_equal(got_ids, want_ids)
        assert got_score == pytest.approx(want_score, abs=1e-3)


def test_wider_beam_never_scores_lower():
    model, params, state = tiny_model(seed=3)
    rng = np.random.default_rng(4)
    x, lens = random_batch(rng, b=3, t=8)
    prev = None
    for k in (1, 2, 4):
        beam = TransducerBeamDecoder(
            model, params, state, _IdCoder(), beam_width=k
        )
        scores = [h[0][1] for h in beam.decode_batch_nbest(x, lens)]
        if prev is not None:
            for a, b in zip(scores, prev):
                assert a >= b - 1e-4
        prev = scores


def test_nbest_sorted_and_unique():
    model, params, state = tiny_model(seed=5)
    rng = np.random.default_rng(6)
    x, lens = random_batch(rng, b=2, t=8)
    beam = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=4
    )
    for row in beam.decode_batch_nbest(x, lens):
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)
        seqs = [tuple(ids.tolist()) for ids, _ in row]
        assert len(seqs) == len(set(seqs)), "merge left duplicate prefixes"


@pytest.mark.parametrize("chunk", [1, 3, 5])
def test_streaming_equals_offline(chunk):
    model, params, state = tiny_model(seed=7)
    rng = np.random.default_rng(8)
    b, t = 2, 9
    x, _ = random_batch(rng, b=b, t=t)
    lens = np.full((b,), t, np.int32)
    k = 3
    offline = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=k, max_tokens=64
    )
    want = offline.decode_batch(x, lens)

    online = OnlineTransducerBeamDecoder(
        model, params, state, beam_width=k, max_tokens=64
    )
    online.reset(b)
    got = None
    for start in range(0, t, chunk):
        piece = x[:, start : start + chunk]
        n = np.full((b,), piece.shape[1], np.int32)
        got = online.step(piece, n)
    for gi, wi in zip(got, want):
        np.testing.assert_array_equal(gi, wi)


def test_decode_to_file(tmp_path):
    """decode_to_file writes one line per utterance via the beam."""
    model, params, state = tiny_model(seed=9)
    rng = np.random.default_rng(10)

    class FakeReader:
        utt_ids = ["utt1", "utt2"]

        def __iter__(self):
            for u in self.utt_ids:
                yield u, rng.standard_normal((6, 5)).astype(np.float32)

    from tfkaldi_tpu.decode import streaming as streaming_mod

    beam = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=2
    )

    def fake_stream(reader, batch_size, bucket_multiple):
        utts, feats = zip(*list(reader))
        t = max(f.shape[0] for f in feats)
        padded = np.zeros((len(feats), t, feats[0].shape[1]), np.float32)
        lens = np.zeros((len(feats),), np.int32)
        for i, f in enumerate(feats):
            padded[i, : f.shape[0]] = f
            lens[i] = f.shape[0]
        yield list(utts), padded, lens

    orig = streaming_mod.pick_stream
    streaming_mod.pick_stream = lambda reader: fake_stream
    try:
        out = tmp_path / "text"
        n = beam.decode_to_file(FakeReader(), str(out))
    finally:
        streaming_mod.pick_stream = orig
    assert n == 2
    lines = out.read_text().strip().splitlines()
    assert [l.split()[0] for l in lines] == ["utt1", "utt2"]


# ---------------------------------------------------------------------------
# dense shallow fusion inside the jitted beam
# ---------------------------------------------------------------------------


class _ZeroFusion:
    """A fusion table of zeros: must leave the search untouched."""

    def __init__(self, num_labels, order=3):
        self.order = order
        self.num_context_ids = num_labels + 1
        self.bos_id = num_labels
        self.table = np.zeros(
            ((num_labels + 1) ** (order - 1), num_labels), np.float32
        )


def test_zero_fusion_table_is_identity():
    model, params, state = tiny_model(seed=30)
    rng = np.random.default_rng(31)
    x, lens = random_batch(rng)
    base = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3
    )
    fused = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3,
        fusion_table=_ZeroFusion(model.config.num_labels),
    )
    for a, b in zip(base.decode_batch_nbest(x, lens),
                    fused.decode_batch_nbest(x, lens)):
        for (ai, asc), (bi, bsc) in zip(a, b):
            np.testing.assert_array_equal(ai, bi)
            assert asc == pytest.approx(bsc, abs=1e-4)


def test_hostile_lm_silences_the_beam():
    """An LM that despises every label (huge negative fused scores) makes
    the all-blank hypothesis win: the beam emits nothing."""
    model, params, state = tiny_model(seed=32)
    rng = np.random.default_rng(33)
    x, lens = random_batch(rng)
    hostile = _ZeroFusion(model.config.num_labels)
    hostile.table = hostile.table - 1e6
    dec = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3, fusion_table=hostile,
    )
    for ids in dec.decode_batch(x, lens):
        assert ids.size == 0


def test_streaming_fused_beam_equals_offline():
    """Fusion terms are functions of the carried (buf, counts), so the
    chunked fused beam equals the offline fused beam at any chunking."""
    model, params, state = tiny_model(seed=34)
    rng = np.random.default_rng(35)
    b, t = 2, 9
    x, _ = random_batch(rng, b=b, t=t)
    lens = np.full((b,), t, np.int32)
    fusion = _ZeroFusion(model.config.num_labels)
    fusion.table = rng.standard_normal(fusion.table.shape).astype(np.float32)
    want = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=3, max_tokens=64,
        fusion_table=fusion,
    ).decode_batch(x, lens)
    online = OnlineTransducerBeamDecoder(
        model, params, state, beam_width=3, max_tokens=64,
        fusion_table=fusion,
    )
    online.reset(b)
    got = None
    for start in range(0, t, 2):
        piece = x[:, start : start + 2]
        n = np.full((b,), piece.shape[1], np.int32)
        got = online.step(piece, n)
    for gi, wi in zip(got, want):
        np.testing.assert_array_equal(gi, wi)


def test_fused_beam_matches_host_oracle():
    """Device beam WITH dense fusion == the host oracle extended with the
    same table lookup at label-extension points (pins exactly WHERE the
    LM term enters the candidate scores)."""
    model, params, state = tiny_model(seed=36)
    rng = np.random.default_rng(37)
    x, lens = random_batch(rng, b=2, t=7)
    fusion = _ZeroFusion(model.config.num_labels, order=2)
    fusion.table = (
        rng.standard_normal(fusion.table.shape).astype(np.float32) * 0.7
    )
    k, s = 3, 2
    beam = TransducerBeamDecoder(
        model, params, state, _IdCoder(), beam_width=k,
        max_symbols_per_frame=s, fusion_table=fusion,
    )
    nbest = beam.decode_batch_nbest(x, lens)

    def lm_row(prefix):
        last = prefix[-1] if prefix else fusion.bos_id
        return fusion.table[last]  # order-2: context = last label

    # oracle: same algorithm as _oracle_beam, with the LM term added to
    # label extensions (blank/stay untouched)
    for row in range(2):
        want_ids, want_score = _oracle_beam_fused(
            model, params, x[row], int(lens[row]), k, s,
            x.shape[1] * s, lm_row,
        )
        got_ids, got_score = nbest[row][0]
        np.testing.assert_array_equal(got_ids, want_ids)
        assert got_score == pytest.approx(want_score, abs=1e-3)


def _oracle_beam_fused(model, params, feats_row, length, k, max_symbols,
                       buf_len, lm_row):
    """_oracle_beam with shallow fusion on label extensions."""
    enc = np.asarray(
        model.encode(params, {}, jnp.asarray(feats_row[None]),
                     jnp.asarray([length], jnp.int32), train=False)[0]
    )[0]

    def pred_step(token, carry):
        proj, new_carry = model.predict_step(
            params, jnp.asarray([token], jnp.int32), jnp.asarray([True]),
            carry,
        )
        return np.asarray(proj)[0], new_carry

    proj0, carry0 = pred_step(model.blank_id, model.init_pred_carry(1))
    slots = [dict(tokens=(), score=0.0, proj=proj0, carry=carry0,
                  active=True)]
    for _ in range(k - 1):
        slots.append(dict(tokens=(), score=_NEG, proj=proj0, carry=carry0,
                          active=True))
    v_total = model.vocab_size

    def logp_of(slot, enc_t):
        logits = model.joint_step(
            params, jnp.asarray(enc_t[None]), jnp.asarray(slot["proj"][None])
        )
        return np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]

    def merge(slots, use_active):
        for j in range(len(slots)):
            if slots[j]["score"] <= _NEG / 2:
                continue
            for i in range(j):
                if slots[i]["score"] <= _NEG / 2:
                    continue
                if slots[i]["tokens"] != slots[j]["tokens"]:
                    continue
                if use_active and slots[i]["active"] != slots[j]["active"]:
                    continue
                slots[i]["score"] = float(
                    np.logaddexp(slots[i]["score"], slots[j]["score"])
                )
                slots[j]["score"] = _NEG
                break
        return slots

    for t in range(int(length)):
        for s in slots:
            s["active"] = True
        for step in range(max_symbols + 1):
            forced = step == max_symbols
            cands = []
            for ki, s in enumerate(slots):
                lp = logp_of(s, enc[t]) if s["active"] else None
                stay = (s["score"] + lp[model.blank_id]
                        if s["active"] else s["score"])
                if forced:
                    s["score"] = stay
                    s["active"] = False
                    continue
                base = ki * (v_total + 1)
                cands.append((stay, base, ki, 0))
                lm = lm_row(s["tokens"]) if s["active"] else None
                for v in range(v_total):
                    if v == model.blank_id or not s["active"] or \
                            len(s["tokens"]) >= buf_len:
                        sc = _NEG
                    else:
                        sc = s["score"] + lp[v] + float(lm[v])
                    cands.append((sc, base + 1 + v, ki, 1 + v))
            if forced:
                slots = merge(slots, use_active=False)
                break
            cands.sort(key=lambda c: (-c[0], c[1]))
            new_slots = []
            for sc, _, parent, choice in cands[:k]:
                p = slots[parent]
                if choice == 0:
                    new_slots.append(dict(tokens=p["tokens"], score=sc,
                                          proj=p["proj"], carry=p["carry"],
                                          active=False))
                else:
                    v = choice - 1
                    proj, carry = pred_step(v, p["carry"])
                    new_slots.append(dict(tokens=p["tokens"] + (v,),
                                          score=sc, proj=proj, carry=carry,
                                          active=True))
            slots = merge(new_slots, use_active=True)
    best = max(slots, key=lambda s: s["score"])
    return np.asarray(best["tokens"], np.int32), best["score"]
