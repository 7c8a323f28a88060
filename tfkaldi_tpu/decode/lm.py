"""Backoff n-gram language models for CTC shallow fusion.

The reference has no language-model rescoring outside Kaldi's WFST (the
LM is compiled into HCLG.fst, kaldi/decode.sh); the CTC/character path it
left unfinished has nothing. This module supplies the classic complement:
a standard ARPA backoff n-gram (Katz-style: use the highest-order hit,
else back off with the recorded penalty) over the target coder's label
ids, fused into the prefix beam search (decode/ctc_beam.py) with the
usual shallow-fusion score ``log P_ctc + alpha·log P_lm + beta·|prefix|``
(Hannun et al. 2014).

Pure Python on purpose: the LM is consulted only when a beam extends a
prefix (beam·vocab times per frame on the host), far off the device hot
path, and the dict-of-tuples representation keeps lookups O(1).
"""

from __future__ import annotations

import gzip
import math
import re


class ArpaLM:
    """Backoff n-gram LM read from an ARPA file (plain or .gz).

    Tokens are looked up as STRINGS (the words of the ARPA file);
    ``score(context, word)`` returns the natural-log conditional
    probability with standard backoff:

        P(w | h) = P*(w | h)                       if (h, w) listed
                 = backoff(h) · P(w | h[1:])       otherwise

    ARPA files store log10; converted to natural log on load.
    """

    _LN10 = math.log(10.0)

    def __init__(self, order: int, ngrams: dict, backoffs: dict):
        self.order = order
        self._ngrams = ngrams  # tuple(words) -> ln P*
        self._backoffs = backoffs  # tuple(words) -> ln backoff weight

    @classmethod
    def load(cls, path: str) -> "ArpaLM":
        opener = gzip.open if path.endswith(".gz") else open
        ngrams: dict[tuple, float] = {}
        backoffs: dict[tuple, float] = {}
        order = 0
        section = 0  # current n-gram order being read; 0 = header
        with opener(path, "rt", encoding="utf-8", errors="replace") as fid:
            for line in fid:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("\\"):
                    m = re.match(r"\\(\d+)-grams:", line)
                    section = int(m.group(1)) if m else 0
                    continue
                if section == 0:
                    continue  # header (ngram N=...) / \data\ / \end\
                parts = line.split()  # logp word1..wordN [backoff]
                if len(parts) < section + 1:
                    raise ValueError(f"malformed {section}-gram line: {line!r}")
                logp = float(parts[0]) * cls._LN10
                words = tuple(parts[1 : 1 + section])
                ngrams[words] = logp
                if len(parts) > section + 1:
                    backoffs[words] = float(parts[1 + section]) * cls._LN10
                order = max(order, section)
        if order == 0:
            raise ValueError(f"no n-gram sections found in {path!r}")
        return cls(order, ngrams, backoffs)

    def score(self, context: tuple, word: str) -> float:
        """ln P(word | context); context is a tuple of preceding words
        (any length — only the last ``order-1`` are used)."""
        context = tuple(context)[-(self.order - 1) :] if self.order > 1 else ()
        while True:
            p = self._ngrams.get(context + (word,))
            if p is not None:
                return p
            if not context:
                # unknown word with an <unk> entry, else hard floor
                unk = self._ngrams.get(("<unk>",))
                return unk if unk is not None else -20.0 * self._LN10
            # back off: drop the oldest context word, pay its penalty if
            # the context itself is listed (0 otherwise, per ARPA)
            penalty = self._backoffs.get(context, 0.0)
            context = context[1:]
            if penalty:
                return penalty + self.score(context, word)


class FusionScorer:
    """Shallow-fusion scorer over LABEL IDS for the prefix beam search.

    Maps label ids to LM tokens through the coder's alphabet once at
    construction, then scores prefix extensions:
    ``alpha · ln P_lm(token | prefix tokens) + beta`` (beta is the word
    insertion bonus, applied per emitted label). Labels whose token the
    LM has never seen still get the backoff/<unk> path — no label is
    vetoed outright by the LM.
    """

    def __init__(self, lm: ArpaLM, id_to_token: list, alpha: float = 0.5,
                 beta: float = 0.0, bos: str | None = "<s>"):
        self.lm = lm
        self.id_to_token = list(id_to_token)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.bos = bos
        self._cache: dict[tuple, float] = {}

    def __call__(self, prefix: tuple, new_id: int) -> float:
        # only the last order-1 labels matter — cache on that suffix, so
        # hit rates stay high as prefixes grow
        key = tuple(prefix[-(self.lm.order - 1) :]) + (new_id,)
        # a short prefix's true context includes BOS; key it separately
        if self.bos is not None and len(prefix) < self.lm.order - 1:
            key = ("<BOS>",) + key
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        context = tuple(self.id_to_token[i] for i in prefix)
        if self.bos is not None:
            context = (self.bos,) + context
        val = (
            self.alpha * self.lm.score(context, self.id_to_token[new_id])
            + self.beta
        )
        if len(self._cache) > 1 << 20:
            self._cache.clear()
        self._cache[key] = val
        return val


class DenseFusionTable:
    """The backoff LM resolved into a dense device table for the JITTED
    beam searches (transducer, attention).

    The host ``FusionScorer`` can't run inside a jitted search; but for a
    label-level n-gram over V labels the *entire* LM is just the function
    ``(last n-1 labels) → V scores``, and Katz backoff resolves it at
    build time: ``table[ctx, v] = alpha · ln P(token_v | ctx) + beta``
    for every context combination — ``(V+1)^(n-1) · C`` floats (~231 KB
    for a character trigram), one host pass over the ArpaLM. Context
    slots take label ids ``0..V-1`` or ``V`` (= BOS, also filling the
    short-prefix positions, matching FusionScorer's ``(<s>,) + prefix``
    convention). At decode time an extension's LM term is ONE gather:
    flatten the context ids base-(V+1) and index the ``[(V+1)^(n-1), C]``
    table. Exactness vs the host scorer is pinned by tests/test_lm.py.

    ``column_tokens`` names each scored column — usually the coder's
    alphabet; an attention decoder appends ``"</s>"`` so its EOS column
    carries the LM's end-of-sentence probability.
    """

    def __init__(self, lm: ArpaLM, context_tokens: list,
                 column_tokens: list, alpha: float = 0.5,
                 beta: float = 0.0, bos: str = "<s>"):
        import numpy as np

        self.order = lm.order
        self.num_context_ids = len(context_tokens) + 1  # + BOS
        self.bos_id = len(context_tokens)
        n_ctx = max(lm.order - 1, 0)
        rows = self.num_context_ids ** n_ctx
        if rows * len(column_tokens) > 1 << 27:
            raise ValueError(
                f"dense fusion table would hold {rows * len(column_tokens)} "
                "entries; lower the LM order or vocabulary"
            )
        table = np.zeros((rows, len(column_tokens)), np.float32)
        for row in range(rows):
            # decode the row's context ids, base num_context_ids, oldest
            # first (index = sum ctx_i * base^(n_ctx-1-i))
            ids, r = [], row
            for _ in range(n_ctx):
                ids.append(r % self.num_context_ids)
                r //= self.num_context_ids
            ids = ids[::-1]
            # BOS fills leading slots; a BOS after a real label never
            # arises in a prefix, but score it consistently anyway
            context = tuple(
                bos if i == self.bos_id else context_tokens[i] for i in ids
            )
            # collapse leading BOS runs to the single <s> the host scorer
            # uses for short prefixes
            while len(context) > 1 and context[0] == bos and context[1] == bos:
                context = context[1:]
            for col, tok in enumerate(column_tokens):
                table[row, col] = alpha * lm.score(context, tok) + beta
        self.table = table  # np [rows, C]; callers jnp.asarray it once

    def flat_context(self, last_ids):
        """``last_ids [..., n-1]`` (oldest first, BOS = ``bos_id``) →
        flat row index into ``table``. Works on numpy or jnp arrays."""
        n_ctx = max(self.order - 1, 0)
        idx = 0
        for i in range(n_ctx):
            idx = idx * self.num_context_ids + last_ids[..., i]
        return idx


def fusion_from_config(conf, coder, column_tokens):
    """Build a :class:`DenseFusionTable` from the ``[nnet]`` config keys
    (``lm_path`` / ``lm_alpha`` / ``lm_beta``); ``None`` without
    ``lm_path``. Shared by the facade decode and the decode service so
    the two can never disagree on fusion semantics."""
    lm_path = conf.get("lm_path", "")
    if not lm_path:
        return None
    if int(conf.get("beam_width", 1)) <= 1:
        raise ValueError("lm_path needs beam_width > 1 in [nnet]")
    return DenseFusionTable(
        ArpaLM.load(lm_path),
        list(coder.alphabet),
        column_tokens,
        alpha=float(conf.get("lm_alpha", 0.5)),
        beta=float(conf.get("lm_beta", 0.0)),
    )


def lm_extension_scores(fusion: DenseFusionTable, table_dev, buf, counts):
    """Jit-side lookup: LM term for extending each hypothesis.

    ``buf [..., L]`` emitted label ids, ``counts [...]`` — returns
    ``[..., C]`` (one fused score per table column). The context is the
    last ``order-1`` emitted labels, BOS-filled for short prefixes; the
    whole lookup is n-1 tiny gathers + one table row gather.
    """
    import jax.numpy as jnp

    n_ctx = max(fusion.order - 1, 0)
    if n_ctx == 0:
        return jnp.broadcast_to(
            table_dev[0], counts.shape + (table_dev.shape[1],)
        )
    flat = None
    for back in range(n_ctx, 0, -1):  # oldest context slot first
        pos = counts - back
        tok = jnp.take_along_axis(
            buf, jnp.maximum(pos, 0)[..., None], axis=-1
        )[..., 0]
        tok = jnp.where(pos >= 0, tok, fusion.bos_id)
        flat = tok if flat is None else flat * fusion.num_context_ids + tok
    return table_dev[flat]
