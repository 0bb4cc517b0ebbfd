"""Schwartz-Hearst, normalization, concept matcher, RIS, ICTRP classifier,
annotator stub, multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trialstreamer_spark.functions import annotate
from trialstreamer_spark.functions.text import (
    extract_abbreviation_pairs,
    match_concepts,
    normalize_concept_string,
)
from trialstreamer_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    frame_sample,
)
from trialstreamer_spark.sources import ictrp_csv, ris


# --- Schwartz-Hearst (golden pairs, SURVEY §5.4) ---------------------------


@pytest.mark.parametrize(
    "text,short,long",
    [
        (
            "This randomized controlled trial (RCT) was large.",
            "RCT",
            "randomized controlled trial",
        ),
        ("We measured quality of life (QOL) at baseline.", "QOL", "quality of life"),
        (
            "Patients with myocardial infarction (MI) were enrolled.",
            "MI",
            "myocardial infarction",
        ),
        ("The confidence interval (CI) was wide.", "CI", "confidence interval"),
    ],
)
def test_schwartz_hearst_goldens(text, short, long):
    assert extract_abbreviation_pairs(text).get(short) == long


def test_schwartz_hearst_rejections():
    assert extract_abbreviation_pairs("no parens here") == {}
    assert extract_abbreviation_pairs(None) == {}
    # invalid short forms: too long, not alnum start
    assert "(" not in extract_abbreviation_pairs("foo (this is far too long to be an abbreviation honestly)")
    # definition must back-match
    assert extract_abbreviation_pairs("completely unrelated words (XYZ)") == {}


def test_abbreviations_udf(spark):
    from trialstreamer_spark.functions.text import abbreviations_udf

    df = spark.createDataFrame(
        [("1", "a randomized controlled trial (RCT) result")], "id string, ab string"
    ).select(abbreviations_udf("ab").alias("abbrev"))
    assert df.collect()[0].abbrev == {"RCT": "randomized controlled trial"}


# --- normalization ---------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Aneurysm, Ruptured", "ruptured aneurysm"),
        ("Diabetes Mellitus, Type 2", "type 2 diabetes mellitus"),
        ("Disease of the Liver, Severe", "disease of the liver, severe"),  # prep guard
        ("Heart-Attack", "heart attack"),
        ("Alzheimer's Disease", "alzheimer disease"),
        ("Arthritis, NOS", "arthritis"),
        ("  Multiple   Spaces  ", "multiple spaces"),
    ],
)
def test_normalize_concept_string(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "s string").select(
        normalize_concept_string(F.col("s")).alias("out")
    )
    assert df.collect()[0].out == expected


def test_match_concepts_greedy_non_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "acute myocardial infarction treated with aspirin")],
        "doc_id long, text string",
    )
    lexicon = spark.createDataFrame(
        [
            ("acute myocardial infarction", "C-AMI"),
            ("myocardial infarction", "C-MI"),
            ("aspirin", "C-ASA"),
        ],
        "term string, cui string",
    )
    rows = {r.cui: r for r in match_concepts(docs, lexicon).collect()}
    # longest-first greedy: AMI wins, MI suppressed, aspirin kept
    assert set(rows) == {"C-AMI", "C-ASA"}
    assert rows["C-AMI"].start == 1 and rows["C-AMI"].end == 3


def _ref_minimap_matcher(text, str_to_cui, lemma_tbl, ignores, stop):
    """Replica of the reference matcher (minimap.py:152-201) with the
    frozen tokenizer/lemma table: sliding windows over LEMMAS looked up
    in str_to_cui, window surface text checked against stopwords, window
    lemma against the ignore list; then the (start, -end) sort and the
    greedy right-border sweep. Same-span CUI ties sorted ascending (the
    declared divergence from dict insertion order)."""
    tokens = [t for t in text.lower().split() if t]
    lemmas = [lemma_tbl.get(t, t) for t in tokens]
    matches = []
    max_len = len(tokens)
    window = max_len
    while window:
        for i in range(max_len - window + 1):
            wt = " ".join(tokens[i : i + window])
            wl = " ".join(lemmas[i : i + window])
            if wl and wl in str_to_cui and wl not in ignores and wt not in stop:
                for cui in sorted(str_to_cui[wl]):
                    matches.append(
                        {"cui": cui, "term": wl, "surface": wt,
                         "start": i + 1, "end": i + window}
                    )
        window -= 1
    matches.sort(key=lambda m: (m["start"], -m["end"], m["cui"]))
    kept, border = [], 0
    for m in matches:
        if m["start"] > border:
            kept.append(m)
            border = m["end"]
    return kept


def test_match_concepts_golden_vs_reference_replica(spark):
    """Lemma layer + the four minimap candidate filters, end to end:
    Spark output must equal the reference-logic replica on documents
    exercising plurals (lemma hits), stopword surfaces, the ignore
    list, ambiguous >15-CUI strings, ≤2-char strings, and overlap."""
    from trialstreamer_spark.functions.text import DEFAULT_STOPWORDS

    lemma = {"aneurysms": "aneurysm", "trials": "trial", "ruptured": "ruptured"}
    str_to_cui = {
        "ruptured aneurysm": ["C-RA"],
        "aneurysm": ["C-AN"],
        "trial": ["C-TR"],
        "the": ["C-THE"],          # stopword surface → suppressed at match
        "control group": ["C-CG"],  # on the ignore list → suppressed
        "mg": ["C-MG"],             # ≤2 chars → dropped in lexicon prep
        "multi": [f"C-{i}" for i in range(16)],  # >15 CUIs → dropped
        "same span": ["C-B", "C-A"],  # same-span tie → cui asc wins
    }
    ignores = {"control group"}
    docs_rows = [
        (1, "ruptured aneurysms treated in trials"),
        (2, "the control group took 10 mg multi"),
        (3, "same span and aneurysms"),
        (4, "nothing relevant here"),
    ]
    # replica applies the lexicon-prep filters the Spark side does
    prepped = {
        t: cuis
        for t, cuis in str_to_cui.items()
        if len(t) >= 3 and len(set(cuis)) <= 15
    }
    want = []
    for doc_id, text in docs_rows:
        for m in _ref_minimap_matcher(
            text, prepped, lemma, ignores, DEFAULT_STOPWORDS
        ):
            want.append((doc_id, m["term"], m["surface"], m["start"], m["end"], m["cui"]))

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    lexicon = spark.createDataFrame(
        [(t, c) for t, cuis in str_to_cui.items() for c in cuis],
        "term string, cui string",
    )
    lemma_df = spark.createDataFrame(
        list(lemma.items()), "token string, lemma string"
    )
    ignore_df = spark.createDataFrame([(t,) for t in ignores], "term string")
    got = [
        (r.id, r.term, r.surface, r.start, r.end, r.cui)
        for r in match_concepts(
            docs, lexicon, lemma_table=lemma_df, ignore_terms=ignore_df
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    # spot-check the semantics the lemma layer buys: the plural hits
    assert (1, "ruptured aneurysm", "ruptured aneurysms", 1, 2, "C-RA") in got
    assert (3, "same span", "same span", 1, 2, "C-A") in got  # cui-asc tie


def test_unique_concepts_dedupes_by_cui(spark):
    from trialstreamer_spark.functions.text import unique_concepts

    docs = spark.createDataFrame(
        [(1, "aspirin then aspirin again")], "doc_id long, text string"
    )
    lexicon = spark.createDataFrame(
        [("aspirin", "C-ASA")], "term string, cui string"
    )
    out = unique_concepts(match_concepts(docs, lexicon)).collect()
    assert [(r.id, r.cui, r.term) for r in out] == [(1, "C-ASA", "aspirin")]


# --- RIS -------------------------------------------------------------------

PUBMED_RIS = """TY  - JOUR
ID  - 12345
TI  - A trial of things
  continued on next line
AB  - Abstract text
ER  -

TY  - JOUR
ID  - 67890
TI  - Second record
ER  -
"""


def test_ris_roundtrip(tmp_path, spark):
    p = tmp_path / "test.ris"
    p.write_text(PUBMED_RIS)
    df = ris.read_ris(spark, str(p))
    recs = df.collect()
    by_rec = {}
    for r in recs:
        by_rec.setdefault(r.record_idx, {})[r.tag] = r.values
    assert len(by_rec) == 2
    assert by_rec[0]["ID"] == ["12345"]
    assert by_rec[0]["TI"] == ["A trial of things continued on next line"]
    # writer
    text = ris.dumps([{"TY": "JOUR", "ID": "1", "TI": "x"}])
    assert "TY  - JOUR" in text and text.rstrip().endswith("ER  -")


# --- ICTRP classifier / dates ----------------------------------------------


@pytest.mark.parametrize(
    "design,want",
    [
        ("Randomized Controlled Trial", "RCT"),
        ("Single-arm study!", "non-RCT"),  # non-RCT list wins first
        ("Observational: cohort", "non-RCT"),
        ("Cluster randomized trial", "RCT"),
        ("Phase II evaluation", "RCT"),  # 'phase ii' is in the full RCT list
        ("Some novel design", "unknown"),
        (None, "unknown"),
    ],
)
def test_is_rct_rules(spark, design, want):
    df = spark.createDataFrame([(design,)], "sd string").select(
        ictrp_csv.is_rct_col(F.col("sd")).alias("out")
    )
    assert df.collect()[0].out == want


def _ref_is_rct(study_design):
    """Verbatim Python replica of the reference classifier
    (ictrp.py:156-186: cleanup has no strip; non-RCT list first)."""
    import re

    if study_design is None:
        return "unknown"
    txt = re.sub(r"[^a-zA-Z\d]", " ", study_design.lower())
    sd_clean = re.sub(r"\s\s+", " ", txt)
    if any(r in sd_clean for r in ictrp_csv.NON_RCT_PHRASES):
        return "non-RCT"
    if any(r in sd_clean for r in ictrp_csv.RCT_PHRASES):
        return "RCT"
    return "unknown"


def test_is_rct_full_phrase_parity(spark):
    """Every phrase from the full transcribed lists, embedded in context
    and with punctuation, classifies identically to the reference logic
    — including the dead entries (':' / double-space phrases that cannot
    match cleaned text)."""
    inputs = [None, "", "something else entirely", "  ", "Allocation: RCT"]
    for p in dict.fromkeys(ictrp_csv.NON_RCT_PHRASES + ictrp_csv.RCT_PHRASES):
        inputs += [p, p.upper(), f"Study design: {p}; multi-center", f"a {p} z"]
    expected = [_ref_is_rct(s) for s in inputs]
    rows = [(i, s) for i, s in enumerate(inputs)]
    got = [
        r.out
        for r in spark.createDataFrame(rows, "i long, sd string")
        .select("i", ictrp_csv.is_rct_col(F.col("sd")).alias("out"))
        .orderBy("i")
        .collect()
    ]
    assert got == expected


def test_date_and_multivalue(spark):
    df = spark.createDataFrame(
        [("14/02/2021", "US; UK ;US;")], "d string, c string"
    ).select(
        ictrp_csv.parse_registry_date(F.col("d")).cast("string").alias("d"),
        ictrp_csv.split_multivalue(F.col("c")).alias("c"),
    )
    r = df.collect()[0]
    assert r.d == "2021-02-14"
    assert sorted(r.c) == ["UK", "US"]


def test_read_ictrp_csv(tmp_path, spark):
    p = tmp_path / "ictrp.csv"
    p.write_text(
        'NCT00000001,Title one,Sci title,Randomized controlled trial,Recruiting,100,14/02/2021,US;UK,https://x\n'
        'ISRCTN000002,Title two,Sci title2,single arm study,Not Recruiting,verybignumber,2020-03-01,DE,https://y\n'
    )
    rows = {r.regid: r for r in ictrp_csv.read_ictrp_csv(spark, str(p)).collect()}
    assert rows["NCT00000001"].is_rct == "RCT"
    assert rows["NCT00000001"].year == 2021
    assert rows["ISRCTN000002"].is_rct == "non-RCT"
    assert rows["ISRCTN000002"].is_recruiting == "not recruiting"
    assert rows["ISRCTN000002"].target_size == "unknown"


# --- annotator stub ----------------------------------------------------------


def test_annotator_stub_deterministic_and_keyed(spark):
    arts = spark.createDataFrame(
        [(str(i), f"title {i}", f"abstract {i}") for i in range(50)],
        "pmid string, title string, abstract_plaintext string",
    ).repartition(4)
    a1 = {r.pmid: r for r in annotate.annotate_articles(arts).collect()}
    a2 = {r.pmid: r for r in annotate.annotate_articles(arts).collect()}
    assert len(a1) == 50
    for k in a1:
        assert a1[k] == a2[k]  # deterministic across runs/partitionings
    r = a1["7"]
    # threshold nesting precise => balanced => sensitive (F19)
    assert (not r.is_rct_precise) or r.is_rct_balanced
    assert (not r.is_rct_balanced) or r.is_rct_sensitive
    assert r.clf_type in ("svm_cnn_ptyp", "svm_cnn")


# --- calibration config (F19/X14) -------------------------------------------


def test_calibration_loader_and_thresholds(spark, tmp_path):
    """Loader reads the reference JSON shape; flags match hand-computed
    cutoffs per model type (pubmed.py:348-389): svm_cnn_ptyp rows use
    the ptyp thresholds, svm_cnn rows the plain ones, any other model
    gets NULL flags (the reference emits none)."""
    import json as _json

    from trialstreamer_spark.functions import calibration as C

    path = tmp_path / "calib.json"
    path.write_text(_json.dumps(C.DEFAULT_CALIBRATION))
    calib = C.load_calibration(str(path))
    # hand-checked values from the published config
    assert calib.threshold("svm_cnn_ptyp", "precise") == 3.7070634945154053
    assert calib.threshold("svm_cnn", "balanced") == 1.6498606653424648

    rows = [
        ("svm_cnn_ptyp", 3.71),  # above ptyp precise → all three True
        ("svm_cnn_ptyp", 2.11),  # above ptyp balanced? (2.1057) yes; precise no
        ("svm_cnn", 2.11),       # above plain precise (2.1089)? yes
        ("svm_cnn", 0.0),        # below plain sensitive (0.0591) → all False
        ("svm", 99.0),           # other model → NULL flags
    ]
    df = C.apply_thresholds(
        spark.createDataFrame(rows, "clf_type string, clf_score double"), calib
    )
    got = [
        (r.is_rct_precise, r.is_rct_balanced, r.is_rct_sensitive)
        for r in df.collect()
    ]
    assert got == [
        (True, True, True),
        (False, True, True),
        (True, True, True),
        (False, False, False),
        (None, None, None),
    ]


def test_calibration_zscale_ensemble(spark):
    """X14: z-scale + weighted ensemble from the scales section,
    hand-computed: z = (s-mean)/std, ensemble = Σ w·z / Σ w."""
    from pyspark.sql import functions as F2

    from trialstreamer_spark.functions import calibration as C

    calib = C.load_calibration()
    df = spark.createDataFrame([(0.5, 0.3)], "svm double, cnn double").select(
        C.ensemble_score_col(
            {"svm": F2.col("svm"), "cnn": F2.col("cnn")}, calib
        ).alias("ens")
    )
    sv, cn = calib.scales["svm"], calib.scales["cnn"]
    z_svm = (0.5 - sv["mean"]) / sv["std"]
    z_cnn = (0.3 - cn["mean"]) / cn["std"]
    want = (z_svm * sv["weight"] + z_cnn * cn["weight"]) / (
        sv["weight"] + cn["weight"]
    )
    got = df.collect()[0].ens
    assert abs(got - want) < 1e-12


def test_calibration_loader_rejects_bad_shape():
    import pytest as _pytest

    from trialstreamer_spark.functions import calibration as C

    with _pytest.raises(ValueError):
        C.load_calibration({"scales": {}})
    with _pytest.raises(ValueError):
        C.load_calibration({"thresholds": {"svm_cnn": {"precise": 1.0}}})


def test_incremental_annotate_skips_done(spark):
    arts = spark.createDataFrame(
        [(str(i), "t", "a") for i in range(10)],
        "pmid string, title string, abstract_plaintext string",
    )
    done = spark.createDataFrame([(str(i),) for i in range(7)], "pmid string")
    out = annotate.incremental_annotate(arts, done)
    assert {r.pmid for r in out.collect()} == {"7", "8", "9"}


def test_embeddings_shape(spark):
    arts = spark.createDataFrame(
        [("1", "t", "text")], "pmid string, title string, abstract_plaintext string"
    )
    emb = annotate.embed_articles(arts).collect()[0].embedding
    assert len(emb) == annotate.EMBEDDING_DIM
    assert all(-1.0 <= v <= 1.0 for v in emb)


# --- multimodal plumbing -----------------------------------------------------


def test_multimodal_features_and_frames(spark):
    rows = [
        (1, "image", b"imagebytes-1", (640, 480, None, None, "png")),
        (2, "audio", b"audiobytes-2", (None, None, 16000, 2000, "wav")),
        (3, "video", b"videobytes-3", (1920, 1080, None, 3500, "h264")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:int,codec:string>",
    )
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert len(feats) == 3
    assert feats[1].n_bytes == len(b"imagebytes-1")
    assert len(feats[1].feature) == 8
    # deterministic fake decode (array<float> is float32 — compare approx)
    assert feats[1].feature == pytest.approx(
        fake_decoder(b"imagebytes-1", "image"), rel=1e-6
    )
    # modality filter prunes before decode
    only_img = extract_features(media, modality="image").collect()
    assert [r.media_id for r in only_img] == [1]
    # frame sampling from metadata: 3500ms @ 1000ms → 3 frames
    frames = frame_sample(media).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000]


def test_real_decoder_is_gated():
    from trialstreamer_spark.operators.multimodal import real_decoder

    with pytest.raises(NotImplementedError):
        real_decoder(b"x", "image")
