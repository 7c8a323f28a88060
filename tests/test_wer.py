"""WER scorer: edit-distance counts and file-level scoring."""

import numpy as np

from tfkaldi_tpu.utils.wer import WerResult, edit_distance, score_text_files


def test_edit_distance_cases():
    assert edit_distance(list("abc"), list("abc")) == (0, 0, 0, 3)
    assert edit_distance(list("abc"), list("axc")) == (1, 0, 0, 2)
    assert edit_distance(list("abc"), list("abxc")) == (0, 1, 0, 3)
    assert edit_distance(list("abc"), list("ac")) == (0, 0, 1, 2)
    assert edit_distance(list("abc"), list("")) == (0, 0, 3, 0)
    assert edit_distance([], list("ab")) == (0, 2, 0, 0)
    # classic: kitten -> sitting = 3 edits (2 sub + 1 ins)
    s, i, d, c = edit_distance(list("kitten"), list("sitting"))
    assert s + i + d == 3


def test_edit_distance_matches_bruteforce():
    """Total cost equals a plain Levenshtein DP on random token pairs."""
    rng = np.random.default_rng(0)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                cur = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev, dp[j] = dp[j], cur
        return dp[-1]

    for _ in range(50):
        a = [str(x) for x in rng.integers(0, 4, rng.integers(0, 10))]
        b = [str(x) for x in rng.integers(0, 4, rng.integers(0, 10))]
        s, i, d, _ = edit_distance(a, b)
        assert s + i + d == lev(a, b), (a, b)


def test_score_text_files(tmp_path):
    (tmp_path / "ref").write_text("u1 the cat sat\nu2 hello world\nu3 gone\n")
    (tmp_path / "hyp").write_text("u1 the cat sat\nu2 hello word extra\n")
    r = score_text_files(str(tmp_path / "ref"), str(tmp_path / "hyp"))
    # u1: 3 correct; u2: 1 sub (word/world) + 1 ins (extra); u3: 1 del (missing)
    assert r.scored_utts == 2 and r.missing_utts == 1
    assert r.substitutions == 1 and r.insertions == 1 and r.deletions == 1
    assert r.ref_tokens == 6
    assert abs(r.wer - 50.0) < 1e-9
    assert "%WER 50.00" in str(r)


def test_char_tokens_to_words():
    from tfkaldi_tpu.utils.wer import char_tokens_to_words

    toks = "<sos> h i <space> t h e r e <eos>".split()
    assert char_tokens_to_words(toks) == ["hi", "there"]
    assert char_tokens_to_words([]) == []
    assert char_tokens_to_words(["<space>", "<space>"]) == []


def test_word_level_scoring_of_char_output(tmp_path):
    from tfkaldi_tpu.utils.wer import char_tokens_to_words, score_text_files

    (tmp_path / "ref").write_text("u1 <sos> h i <space> y o u <eos>\n")
    (tmp_path / "hyp").write_text("u1 h i <space> y o l\n")
    # char level: 1 sub (u->l) over 6 chars+1 space... token space differs
    word = score_text_files(
        str(tmp_path / "ref"), str(tmp_path / "hyp"), transform=char_tokens_to_words
    )
    assert word.ref_tokens == 2  # hi you
    assert word.substitutions == 1 and word.correct == 1  # you -> yol
