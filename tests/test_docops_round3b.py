"""Round-3b training-mix hygiene operators: decontamination
(functions/decontam.py), generic per-group top-k (functions/topk.py),
text normalization (text.normalize), n-gram-shingle ssjoin, and the
deterministic hash split — each pinned to a brute-force Python/pandas
reference across partitionings."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# ---------------------------------------------------------------- decontam

def _grams(text: str, n: int) -> set:
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _ref_decontam(docs: list[tuple[int, str]], bench_pred, n: int):
    """Brute-force reference: distinct-gram hit counts vs the union of
    the benchmark docs' gram sets."""
    bench = set()
    for did, text in docs:
        if bench_pred(did):
            bench |= _grams(text, n)
    out = {}
    for did, text in docs:
        if bench_pred(did):
            continue
        hits = len(_grams(text, n) & bench)
        if hits:
            out[did] = hits
    return out


def test_flat_gram_hashes_boundary_masking():
    """Gram hashes never straddle doc boundaries, and per-doc gram
    hashes equal the hashes computed doc-by-doc."""
    from datacapsule_ray.functions.decontam import _P, flat_gram_hashes
    from datacapsule_ray.functions.dedup import _stable_u64

    rng = np.random.default_rng(7)
    docs = [["w%d" % rng.integers(0, 20) for _ in range(int(k))]
            for k in rng.integers(0, 9, size=12)]  # incl. len < n docs
    flat = [t for d in docs for t in d]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    hs = _stable_u64(flat) if flat else np.zeros(0, np.uint64)
    g, n_grams = flat_gram_hashes(hs, lens, 3)
    assert n_grams.tolist() == [max(len(d) - 2, 0) for d in docs]
    assert len(g) == int(n_grams.sum())
    # per-doc recompute
    expect = []
    mask = (1 << 64) - 1
    for d in docs:
        h = _stable_u64(d) if d else np.zeros(0, np.uint64)
        for i in range(max(len(d) - 2, 0)):
            v = int(h[i])
            for j in (1, 2):  # Python-int wrap avoids numpy overflow warns
                v = (v * int(_P) + int(h[i + j])) & mask
            expect.append(v)
    assert [int(x) for x in g] == expect


@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_decontaminate_matches_bruteforce(n_blocks):
    from datacapsule_ray.functions.decontam import decontaminate

    rng = np.random.default_rng(11)
    vocab = ["tok%02d" % i for i in range(30)]
    docs = []
    for did in range(60):
        k = int(rng.integers(3, 25))
        docs.append((did, " ".join(rng.choice(vocab, size=k))))
    # plant guaranteed overlaps: docs 5/17 copy a bench doc's phrase
    docs[5] = (5, docs[0][1] + " " + docs[5][1])
    docs[17] = (17, " ".join(docs[10][1].split()[:6]))

    def pred(did):
        return did % 10 == 0

    ref = _ref_decontam(docs, pred, 4)
    assert 5 in ref  # the plant actually fires

    def is_bench(batch: pa.Table) -> pa.Array:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.array(ids % 10 == 0)

    ds = rd.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs],
        "text": [t for _, t in docs],
    })).repartition(n_blocks)
    stats = {}
    got = decontaminate(ds, is_bench, n=4, stats=stats).to_pandas()
    got_map = dict(zip(got["doc_id"], got["n_hits"]))
    assert got_map == ref
    assert stats["bench_grams"] > 0


def test_decontaminate_broadcast_cap_raises():
    from datacapsule_ray.functions.decontam import decontaminate

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["a b c d e f g h", "a b c d"],
    }))
    with pytest.raises(ValueError, match="broadcast_cap"):
        decontaminate(ds, lambda b: pa.array([True, False]), n=4,
                      broadcast_cap=2).materialize()


# ----------------------------------------------------------------- topk

@pytest.mark.parametrize("n_blocks,k", [(1, 2), (4, 1), (9, 3)])
def test_per_group_topk_matches_pandas(n_blocks, k):
    from datacapsule_ray.functions.topk import per_group_topk

    rng = np.random.default_rng(23)
    n = 200
    df = pd.DataFrame({
        "g": rng.choice(["s%d" % i for i in range(12)], size=n),
        "v": rng.integers(0, 40, size=n),       # heavy value ties
        "id": np.arange(n),                     # unique tiebreak
    })
    ref = (df.sort_values(["g", "v", "id"],
                          ascending=[True, False, True], kind="stable")
           .groupby("g", group_keys=False).head(k)
           .sort_values(["g", "v", "id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)
    got = (per_group_topk(ds, group_col="g", order_cols=["v", "id"],
                          descending=[True, False], k=k)
           .to_pandas()
           .sort_values(["g", "v", "id"], ascending=[True, False, True])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref,
                                  check_dtype=False)


def test_per_group_topk_single_giant_group():
    """One group spanning every block: the whole dataset is edge runs,
    the driver fixup must still return exactly k rows."""
    from datacapsule_ray.functions.topk import per_group_topk

    df = pd.DataFrame({"g": ["x"] * 64, "v": np.arange(64), "id": np.arange(64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = per_group_topk(ds.repartition(8), group_col="g",
                         order_cols=["v", "id"], descending=[True, False],
                         k=3).to_pandas().sort_values("v", ascending=False)
    assert got["v"].tolist() == [63, 62, 61]


# ------------------------------------------------------------- normalize

def test_normalize_matches_python_reference():
    from datacapsule_ray.functions.text import normalize

    texts = ["  Hello   WORLD \t foo ", "", "a\nb\r\n  c", "ALREADY clean",
             None, "   ", "MiXeD   CaSe　ok", "edge　"]
    # U+3000: RE2 (pyarrow AND DuckDB) treats \s as ASCII-only, and
    # DuckDB trim() strips ' ' only — the kernel must preserve the
    # ideographic space mid-string AND at the edges
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": pa.array(texts, type=pa.string()),
    }))
    got = normalize(ds).to_pandas().set_index("doc_id")
    import re

    for i, t in enumerate(texts):
        if t is None:  # SQL null propagation
            assert pd.isna(got.loc[i, "norm_fp"])
            assert pd.isna(got.loc[i, "n_chars_norm"])
            continue
        norm = re.sub(r"\s+", " ", t.lower(), flags=re.ASCII).strip(" ")
        assert got.loc[i, "norm_fp"] == hashlib.md5(
            norm.encode()).hexdigest(), (i, t)
        assert got.loc[i, "n_chars_norm"] == len(norm)


# ---------------------------------------------------------- ngram ssjoin

def _ngram_set(text: str, n: int) -> frozenset:
    toks = text.split()
    return frozenset(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_jaccard_ssjoin_ngram_matches_bruteforce(n_blocks):
    from datacapsule_ray.functions.ssjoin import jaccard_ssjoin

    rng = np.random.default_rng(5)
    vocab = ["w%d" % i for i in range(15)]
    rows = []
    for did in range(40):
        k = int(rng.integers(3, 15))
        rows.append((did, " ".join(rng.choice(vocab, size=k))))
    # planted near-dup pair: shares most 3-grams
    rows[30] = (30, rows[31][1] + " extra")

    ref = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = _ngram_set(rows[i][1], 3), _ngram_set(rows[j][1], 3)
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if 2 * inter >= union:
                ref[(rows[i][0], rows[j][0])] = (inter, union)
    assert (30, 31) in ref  # the plant fires

    ds = rd.from_arrow(pa.table({
        "doc_id": [d for d, _ in rows],
        "text": [t for _, t in rows],
    })).repartition(n_blocks)
    got = jaccard_ssjoin(ds, tau_num=1, tau_den=2, ngram=3).to_pandas()
    got_map = {(min(a, b), max(a, b)): (i, u) for a, b, i, u in
               zip(got["id_a"], got["id_b"], got["n_inter"], got["n_union"])}
    assert got_map == ref


# --------------------------------------------------------------- split

def test_split_docs_hash_deterministic_and_stable(tmp_path):
    """Same doc → same split regardless of which other docs are
    present (the additive-stability property), and fractions are
    plausible (12/2/2 sixteenths)."""
    from datacapsule_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    a = docops.split_docs_hash(sf).to_pandas()
    b = docops.split_docs_hash(sf).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    frac = a["split"].value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.9
    assert frac.get("val", 0) > 0.02 and frac.get("test", 0) > 0.02
    # per-doc assignment equals the direct md5 rule
    for _, r in a.head(20).iterrows():
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0]
        want = "val" if h in "cd" else "test" if h in "ef" else "train"
        assert r["split"] == want


# --------------------------------------------------------------- mixture

def test_mixture_sample_docs_matches_rule():
    """Per-source acceptance equals the direct md5-byte rule, and the
    per-source keep fractions track the declared weights."""
    from datacapsule_ray.pipelines import docops

    sf = "/root/testdata/sf0.01"
    got = docops.mixture_sample_docs(sf).to_pandas()
    all_docs = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "source"]).to_pandas()

    def keep(row) -> bool:
        byte = int(hashlib.md5(
            str(row["doc_id"]).encode()).hexdigest()[:2], 16)
        rate = (int(row["source"][3:]) % 4 + 1) * 64
        return byte < rate

    want = all_docs[all_docs.apply(keep, axis=1)]
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True))
    # the full-weight sources keep everything; the 1/4 sources keep less
    merged = all_docs.assign(kept=all_docs["doc_id"].isin(got["doc_id"]))
    rates = merged.groupby(
        merged["source"].str[3:].astype(int) % 4)["kept"].mean()
    assert rates[3] == 1.0          # (n % 4 == 3) → rate 4/4
    assert rates[0] < rates[3]      # (n % 4 == 0) → rate 1/4


# ---------------------------------------------------------- capstone mix

def _staged_mix_reference(df: pd.DataFrame) -> pd.DataFrame:
    """Sequential reference for training_mix_docs with the ENGINE's
    stage order: gate+eval+decontam -> dedup (register min-id winner
    FIRST) -> mixture -> split. Registering before the mixture check
    matters: a group whose min-id winner fails the mixture byte must
    vanish entirely, not fall through to a later duplicate."""
    import re

    bench_grams, doc_grams = set(), {}
    for _, r in df.iterrows():
        toks = r["text"].split()
        grams = {" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)}
        if r["doc_id"] % 101 == 0:
            bench_grams |= grams
        else:
            doc_grams[r["doc_id"]] = grams
    out, seen = [], set()
    for _, r in df.sort_values("doc_id").iterrows():
        did = r["doc_id"]
        if did % 101 == 0 or r["n_chars"] < 100:
            continue
        if doc_grams[did] & bench_grams:
            continue
        fp = hashlib.md5(re.sub(r"\s+", " ", r["text"].lower(),
                                flags=re.ASCII).strip(" ").encode()
                         ).hexdigest()
        if fp in seen:
            continue
        seen.add(fp)  # min-id winner registered BEFORE the mix check
        h = hashlib.md5(str(did).encode()).hexdigest()
        if int(h[:2], 16) >= (int(r["source"][3:]) % 4 + 1) * 64:
            continue
        split = ("val" if h[0] in "cd" else
                 "test" if h[0] in "ef" else "train")
        out.append((did, r["source"], split))
    return pd.DataFrame(sorted(out), columns=["doc_id", "source", "split"])


def test_training_mix_docs_matches_staged_reference():
    """The composed pipeline equals running the stages sequentially in
    plain Python over the sf0.01 corpus."""
    from datacapsule_ray.pipelines import docops

    sf = "/root/testdata/sf0.01"
    got = docops.training_mix_docs(sf).to_pandas()
    df = rd.read_parquet(f"{sf}/documents.parquet").to_pandas()
    want = _staged_mix_reference(df)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want,
        check_dtype=False)


def test_training_mix_docs_dedup_winner_semantics(tmp_path):
    """Planted normalized duplicates (absent from sf0.01, which has
    zero) pin the dedup stage: the min-id member wins, and a group
    whose winner fails the mixture byte vanishes entirely rather than
    falling through to a later duplicate that would have passed."""
    from datacapsule_ray.pipelines import docops

    def byte(did: int) -> int:
        return int(hashlib.md5(str(did).encode()).hexdigest()[:2], 16)

    # source src0 -> acceptance byte < 64
    fail_ids = [i for i in range(1, 400) if byte(i) >= 64 and i % 101]
    pass_ids = [i for i in range(1, 400) if byte(i) < 64 and i % 101]
    a_fail, b_pass = fail_ids[0], [i for i in pass_ids if i > fail_ids[0]][0]
    c_pass, d_any = pass_ids[1], max(fail_ids[1], pass_ids[2])
    base = "alpha beta gamma delta " * 8  # > 100 chars, bench-disjoint
    dup1 = "  ALPHA beta   gamma delta " + base  # normalized-equal pair 1
    dup1b = "alpha BETA gamma\tdelta " + base
    dup2 = "epsilon zeta eta theta " * 8
    rows = [
        (0, "src0", "bench only words " * 10),        # eval doc (0 % 101)
        (a_fail, "src0", dup1),   # group 1 winner: FAILS mixture byte
        (b_pass, "src0", dup1b),  # group 1 later dup: would pass
        (c_pass, "src0", dup2),   # group 2 winner: passes
        (d_any, "src0", dup2),    # group 2 later dup
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["n_chars"] = df["text"].str.len()
    df["lang"] = "en"
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    got = (docops.training_mix_docs(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # normalized equality sanity for the planted pair
    import re

    norm = lambda t: re.sub(r"\s+", " ", t.lower(), flags=re.ASCII).strip(" ")
    assert norm(dup1) == norm(dup1b)
    # group 1 vanished (winner a_fail filtered); group 2 kept c_pass only
    assert got["doc_id"].tolist() == [c_pass]
    want = _staged_mix_reference(df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------------ incremental dedup

def test_incremental_dedup_docs_planted(tmp_path):
    """A new-shard doc whose normalized text already exists in the
    corpus is dropped; novel ones survive (the synthetic tables carry
    zero normalized duplicates, so semantics are pinned here with
    planted copies)."""
    import pyarrow.parquet as pq

    from datacapsule_ray.pipelines import docops

    rows = [
        (2, "src0", "the quick brown fox jumps over the dog"),  # existing
        (4, "src0", "a wholly different existing document"),    # existing
        (1, "src0", "  THE quick   brown fox jumps over the dog "),  # dup
        (3, "src0", "novel new-shard text nothing matches"),    # novel
        (5, "src0", "a wholly DIFFERENT existing document"),    # dup of 4
        (7, "src0", "novel new-shard text nothing matches"),    # intra-new
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["n_chars"] = df["text"].str.len()
    df["lang"] = "en"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "documents.parquet")
    got = sorted(docops.incremental_dedup_docs(str(tmp_path))
                 .to_pandas()["doc_id"].tolist())
    # 1 and 5 collapse into existing docs; 3 and 7 survive (the join is
    # vs the EXISTING corpus only — intra-shard dups are exact_dedup's
    # job, both 3 and 7 pass)
    assert got == [3, 7]


def test_incremental_dedup_docs_matches_oracle_shape():
    from datacapsule_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    got = docops.incremental_dedup_docs(sf).to_pandas()
    df = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    # zero normalized dups in the synthetic corpus: every odd id survives
    assert sorted(got["doc_id"]) == sorted(
        df[df["doc_id"] % 2 == 1]["doc_id"].tolist())
