"""Porter stemmer (Porter 1980) + METEOR stem-alignment stage."""


def test_porter_published_vectors():
    from docling_eval_spark.functions.stemmer import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for w, expect in vectors.items():
        got = porter_stem(w, mode="original")
        assert got == expect, (w, got, expect)


def test_nltk_extensions_deviations():
    """NLTK_EXTENSIONS mode (the reference's meteor stemmer) departs
    from Porter 1980 on documented cases (nltk/stem/porter.py)."""
    from docling_eval_spark.functions.stemmer import porter_stem

    # irregular-forms pool
    for w, s in [("dying", "die"), ("lying", "lie"), ("tying", "tie"),
                 ("skies", "sky"), ("sky", "sky"), ("news", "news"),
                 ("innings", "inning"), ("proceed", "proceed")]:
        assert porter_stem(w) == s, (w, porter_stem(w))
    # 4-letter ies -> ie (vs 1980's bare 'i')
    assert porter_stem("ties") == "tie"
    assert porter_stem("ties", mode="original") == "ti"
    assert porter_stem("dies") == "die"
    # ied: 'ie' at 4 letters, 'i' beyond
    assert porter_stem("died") == "die"
    assert porter_stem("studied") == "studi"
    # modified 1c: y -> i only after a consonant
    assert porter_stem("enjoy") == "enjoy"
    assert porter_stem("enjoy", mode="original") == "enjoi"
    assert porter_stem("crying") == "cri"
    # fulli -> ful extension chains into step 3/5
    assert porter_stem("gratefully") == "grate"
    assert porter_stem("gratefully", mode="original") == "gratefulli"
    # nltk-only logi -> log rule (measures word[:-3], not the 4-char stem)
    assert porter_stem("geology") == "geolog"
    assert porter_stem("geological") == "geolog"
    assert porter_stem("biology") == "biolog"
    assert porter_stem("geology", mode="original") == "geologi"
    # both modes agree on ordinary vocabulary
    for w in ["running", "caresses", "happiness", "relational",
              "adjustment", "effective"]:
        assert porter_stem(w) == porter_stem(w, mode="original")


def test_meteor_stem_stage_matches_inflections():
    from docling_eval_spark.functions.text_metrics import meteor_score

    # 'running'/'runs' and 'cats'/'cat' only match via stems
    pred = "the cats were running fast".split()
    true = "the cat was runs fast".split()
    with_stem = meteor_score(pred, true)
    # exact-only alignment would match {the, fast} = 2 of 5
    assert with_stem > meteor_score(pred, ["xxx"] * 5)
    exact_only_m = 2
    assert with_stem > 0.3  # 4 matches incl. stems beat 2 exact

    # identical sentences: one chunk, stems change nothing
    s = "alpha beta gamma delta".split()
    assert meteor_score(s, s) == meteor_score(list(s), list(s))
    assert meteor_score(s, s) > 0.99 * (1 - 0.5 * (1 / 4) ** 3)
    assert exact_only_m == 2


def test_meteor_stem_does_not_steal_exact_matches():
    from docling_eval_spark.functions.text_metrics import meteor_score

    # 'run' appears exactly in both; 'running' should stem-match the
    # remaining 'runs', not consume the exact 'run' slot
    pred = "run running".split()
    true = "run runs".split()
    assert meteor_score(pred, true) == meteor_score(
        "run running".split(), "run runs".split())
    # all 4 tokens aligned -> precision = recall = 1
    s = meteor_score(pred, true)
    assert s > 0.9  # full alignment, single-chunk-ish penalty only
