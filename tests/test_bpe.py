"""From-scratch byte-level BPE (GPT-2 algorithm): pre-tokenizer regex
semantics, merge order, closed-form count identity, and the Spark
token-count / pack integration."""

from __future__ import annotations

import pytest


def test_bytes_to_unicode_is_bijection():
    from docling_eval_spark.functions.bpe import bytes_to_unicode

    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printables map to themselves; control bytes shift past U+0100
    assert m[ord("A")] == "A" and m[ord("~")] == "~"
    assert ord(m[0]) >= 256 and ord(m[ord(" ")]) >= 256


def test_pre_tokenize_gpt2_semantics():
    from docling_eval_spark.functions.bpe import pre_tokenize

    # spaces attach to the FOLLOWING token; contractions split
    assert pre_tokenize("hello world") == ["hello", " world"]
    assert pre_tokenize("I'll go") == ["I", "'ll", " go"]
    assert pre_tokenize("it's 42%!") == ["it", "'s", " 42", "%!"]
    # whitespace runs donate their last space to the next token
    assert pre_tokenize("a  b") == ["a", " ", " b"]
    assert pre_tokenize("a   b") == ["a", "  ", " b"]
    # newline is its own token even before a letter (' ?' is a literal
    # space in the GPT-2 pattern, not \s)
    assert pre_tokenize("a\nb") == ["a", "\n", "b"]
    assert pre_tokenize("a \nb") == ["a", " ", "\n", "b"]
    # trailing whitespace is one token
    assert pre_tokenize("ab  ") == ["ab", "  "]
    # uppercase contraction does NOT match (case-sensitive pattern)
    assert pre_tokenize("IT'S") == ["IT", "'", "S"]
    # apostrophe after a space goes to the punctuation run
    assert pre_tokenize("a 's") == ["a", " '", "s"]
    # digits and letters split
    assert pre_tokenize("v2 go") == ["v", "2", " go"]


def test_pre_tokenize_roundtrips():
    from docling_eval_spark.functions.bpe import pre_tokenize

    for t in ["hello  world\n\nnext 'para'  42%", "", " ", "a", "\n",
              "  leading", "trailing  ", "unicode: naïve café 日本語 1²3"]:
        assert "".join(pre_tokenize(t)) == t, t


def test_bpe_merge_order_and_iteration():
    from docling_eval_spark.functions.bpe import bpe_encode

    merges = [("a", "b"), ("ab", "c")]
    assert bpe_encode("abc", merges) == ["abc"]
    assert bpe_encode("ababc", merges) == ["ab", "abc"]
    assert bpe_encode("cab", merges) == ["c", "ab"]
    assert bpe_encode("aabb", merges) == ["a", "ab", "b"]
    # lowest rank first: with (b,c) ranked ABOVE (a,b), 'abc' becomes
    # a + bc (rule order decides, not left-to-right position)
    assert bpe_encode("abc", [("b", "c"), ("a", "b")]) == ["a", "bc"]
    # no merges -> one token per byte
    assert bpe_encode("abc", []) == ["a", "b", "c"]


def test_bpe_count_closed_form_identity():
    """The oracle identity: with merges [('a','b'), ('ab','c')] the
    count is bytes - occ('ab') - occ('abc') for any text (merges never
    cross pre-token boundaries)."""
    from docling_eval_spark.functions.bpe import bpe_token_count

    merges = [("a", "b"), ("ab", "c")]
    texts = ["abc abab", "the cab crabs grabbed a kebab.",
             "ab\nabc ab", "no pairs here", "aaabbbccc",
             "abcabc ababc", "x ab! 'abc'"]
    for t in texts:
        expect = (len(t.encode()) - t.count("ab") - t.count("abc"))
        assert bpe_token_count(t, merges) == expect, t


def test_load_merges_format():
    from docling_eval_spark.functions.bpe import load_merges

    lines = ["#version: 0.2", "", "a b", "ab c"]
    assert load_merges(lines) == [("a", "b"), ("ab", "c")]


def test_with_bpe_token_counts_spark(spark):
    from docling_eval_spark.operators.webtext import with_bpe_token_counts

    rows = [(1, "abc abab"), (2, "plain words"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.n_bpe_tokens for r in
           with_bpe_token_counts(df, [("a", "b"), ("ab", "c")]).collect()}
    assert out[1] == 8 - 3 - 1      # 'abc' + ' ab' + 'ab' merges
    assert out[2] == len("plain words")
    assert out[3] == 0


def test_pack_sequences_token_col_mode(spark):
    """token_col mode must pack on the provided counts verbatim —
    byte-identical to packing a whitespace corpus with those counts."""
    from docling_eval_spark.operators.webtext import pack_sequences

    rows = [(i, "ignored", 10 + i % 7) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_tok"])
    out = {r.doc_id: r for r in
           pack_sequences(df, ctx_len=16, token_col="n_tok").collect()}
    cum = 0
    for i in range(50):
        n = 10 + i % 7
        assert out[i].n_tokens == n
        assert out[i].tok_start == cum
        assert out[i].seq_first == cum // 16
        assert out[i].seq_last == (cum + n - 1) // 16
        cum += n


def test_cli_pack_bpe_merges(spark, tmp_path):
    from docling_eval_spark import cli

    rows = [(i, "abc ab " * (1 + i % 3)) for i in range(20)]
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "manifest")
    summ = str(tmp_path / "pack.json")
    mpath = tmp_path / "merges.txt"
    mpath.write_text("#version: test\na b\nab c\n")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(inp)

    cli.main(["pack", "--input", inp, "--output", out,
              "--ctx", "16", "--bpe-merges", str(mpath),
              "--summary", summ])

    import json
    man = spark.read.parquet(out).collect()
    # per repeat of 'abc ab ': 7 bytes - occ('ab')*1*2 - occ('abc')*1
    per = {i: len("abc ab " * (1 + i % 3)) - 2 * (1 + i % 3) - (1 + i % 3)
           for i in range(20)}
    got = {r.doc_id: r.n_tokens for r in man}
    assert got == per
    s = json.loads(open(summ).read())
    assert s["n_tokens"] == sum(per.values())
