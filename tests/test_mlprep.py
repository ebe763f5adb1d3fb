"""KG-completion prep ops vs brute-force Python recomputes from the
generator-anchored golden edges: split determinism/partition, inverse
leakage truth, and the full negative-sample set (not just counts)."""

import csv
import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_to_jsonld_processor_spark.session import get_spark

SF = "/root/testdata/sf0.01"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "kg_webtext_edges.csv")


@pytest.fixture(scope="module")
def spark():
    return get_spark("mlprep", cpus=8)


@pytest.fixture(scope="module")
def triples():
    with open(GOLDEN) as f:
        return sorted({(r["subj"], r["pred"], r["obj"]) for r in csv.DictReader(f)})


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_edge_split_partitions_and_leaks(spark, triples):
    from csv_to_jsonld_processor_spark.kg.mlprep import (
        SPLIT_BUCKETS,
        kg_edge_split,
    )

    bucket = {t: _u32("|".join(t)) % SPLIT_BUCKETS for t in triples}
    train = {t for t, b in bucket.items() if b < SPLIT_BUCKETS - 2}
    valid = {t for t, b in bucket.items() if b == SPLIT_BUCKETS - 2}
    test = {t for t, b in bucket.items() if b == SPLIT_BUCKETS - 1}
    assert train | valid | test == set(triples)  # exact partition

    def leaks(split):
        return sum(1 for s, p, o in split if (o, p, s) in train)

    expect = {}
    preds = {p for _s, p, _o in triples}
    for p in preds:
        expect[p] = (
            sum(1 for t in train if t[1] == p),
            sum(1 for t in valid if t[1] == p),
            sum(1 for t in test if t[1] == p),
            leaks({t for t in valid if t[1] == p}),
            leaks({t for t in test if t[1] == p}),
        )
    got = {
        r.pred: (r.n_train, r.n_valid, r.n_test, r.n_valid_inv_leak, r.n_test_inv_leak)
        for r in kg_edge_split(spark, SF).collect()
    }
    assert got == expect
    # the audit is non-degenerate on this KB: symmetric predicates leak
    assert any(v[3] + v[4] > 0 for v in got.values())


def test_negative_samples_match_full_recompute(spark, triples):
    from csv_to_jsonld_processor_spark.kg.mlprep import NEG_K, kg_negative_samples

    tset = set(triples)
    pool = sorted({s for s, _p, _o in triples} | {o for _s, _p, o in triples})
    n = len(pool)
    agg = {}
    for s, p, o in triples:
        for k in range(NEG_K):
            neg = pool[_u32(f"{s}|{p}|{o}|{k}") % n]
            a = agg.setdefault(p, [0, 0, 0, 0])
            a[0] += 1
            if (s, p, neg) in tset:
                a[1] += 1
            else:
                a[2] += 1
                a[3] += _u32(f"{s}|{p}|{neg}")
    got = {
        r.pred: (r.n_candidates, r.n_accidental_removed, r.n_kept, r.neg_checksum)
        for r in kg_negative_samples(spark, SF).collect()
    }
    assert got == {p: tuple(v) for p, v in agg.items()}
    # filter fires and keeps a majority: both behaviors observable
    assert all(v[1] > 0 and v[2] > v[1] for v in got.values())


def test_transe_mrr_matches_full_recompute(spark, triples):
    from csv_to_jsonld_processor_spark.kg.mlprep import (
        EVAL_DIMS,
        EVAL_K,
        EVAL_MOD,
        MRR_SCALE,
        SPLIT_BUCKETS,
        kg_transe_mrr,
    )

    tset = set(triples)
    pool = sorted({s for s, _p, _o in triples} | {o for _s, _p, o in triples})
    n = len(pool)

    def emb(name: str):
        return [
            _u32(f"{name}#{i}") % EVAL_MOD - EVAL_MOD // 2 for i in range(EVAL_DIMS)
        ]

    def dist(s, p, o):
        es, rp, eo = emb(s), emb(f"P|{p}"), emb(o)
        return sum(abs(es[i] + rp[i] - eo[i]) for i in range(EVAL_DIMS))

    agg = {}
    for s, p, o in triples:
        if _u32(f"{s}|{p}|{o}") % SPLIT_BUCKETS != SPLIT_BUCKETS - 1:
            continue
        d_true = dist(s, p, o)
        negs = [pool[_u32(f"{s}|{p}|{o}|E|{k}") % n] for k in range(EVAL_K)]
        kept = [ng for ng in negs if (s, p, ng) not in tset]
        rank = 1 + sum(1 for ng in kept if dist(s, p, ng) <= d_true)
        a = agg.setdefault(p, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(kept)
        a[2] += 1 if rank == 1 else 0
        a[3] += MRR_SCALE // rank
    got = {
        r.pred: (r.n_test, r.n_neg_eval, r.n_hits1, r.mrr_x2520)
        for r in kg_transe_mrr(spark, SF).collect()
    }
    assert got == {p: tuple(v) for p, v in agg.items()}
    # non-degenerate: random embeddings rank above chance-floor somewhere,
    # below perfection everywhere the corruption pool survived filtering
    assert any(v[3] > 0 for v in got.values())
    assert any(v[1] > 0 and v[2] < v[0] for v in got.values())


def test_transe_epoch_matches_full_recompute(spark, triples):
    """Brute-force Python replay of the full-batch epoch: forward pass,
    hinge, per-dim subgradients, parameter all-reduce, after-loss —
    every column must match exactly."""
    from csv_to_jsonld_processor_spark.kg.mlprep import (
        EPOCH_GAMMA,
        EPOCH_LR,
        EVAL_DIMS,
        EVAL_MOD,
        kg_transe_epoch,
    )

    pool = sorted({s for s, _p, _o in triples} | {o for _s, _p, o in triples})
    n = len(pool)

    def emb(name: str):
        return [
            _u32(f"{name}#{i}") % EVAL_MOD - EVAL_MOD // 2 for i in range(EVAL_DIMS)
        ]

    def sgn(x):
        return 1 if x > 0 else (-1 if x < 0 else 0)

    tn = [(s, p, o, pool[_u32(f"{s}|{p}|{o}|T") % n]) for s, p, o in triples]
    upd = {}
    before = {}
    for s, p, o, ng in tn:
        es, rp, eo, en = emb(s), emb(f"P|{p}"), emb(o), emb(ng)
        d_pos = sum(abs(es[i] + rp[i] - eo[i]) for i in range(EVAL_DIMS))
        d_neg = sum(abs(es[i] + rp[i] - en[i]) for i in range(EVAL_DIMS))
        before[(s, p, o)] = (d_pos, d_neg)
        if EPOCH_GAMMA + d_pos - d_neg > 0:
            for i in range(EVAL_DIMS):
                gp = sgn(es[i] + rp[i] - eo[i])
                gn = sgn(es[i] + rp[i] - en[i])
                for key, dv in ((s, -EPOCH_LR * (gp - gn)),
                                (f"P|{p}", -EPOCH_LR * (gp - gn)),
                                (o, EPOCH_LR * gp), (ng, -EPOCH_LR * gn)):
                    upd[(key, i)] = upd.get((key, i), 0) + dv
    upd_l1 = sum(abs(v) for v in upd.values())

    def emb2(name: str):
        base = emb(name)
        return [base[i] + upd.get((name, i), 0) for i in range(EVAL_DIMS)]

    agg = {}
    for s, p, o, ng in tn:
        d_pos, d_neg = before[(s, p, o)]
        es, rp, eo, en = emb2(s), emb2(f"P|{p}"), emb2(o), emb2(ng)
        d_pos2 = sum(abs(es[i] + rp[i] - eo[i]) for i in range(EVAL_DIMS))
        d_neg2 = sum(abs(es[i] + rp[i] - en[i]) for i in range(EVAL_DIMS))
        a = agg.setdefault(p, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if EPOCH_GAMMA + d_pos - d_neg > 0 else 0
        a[2] += max(0, EPOCH_GAMMA + d_pos - d_neg)
        a[3] += 1 if EPOCH_GAMMA + d_pos2 - d_neg2 > 0 else 0
        a[4] += max(0, EPOCH_GAMMA + d_pos2 - d_neg2)

    got = {
        r.pred: (r.n_triples, r.n_active, r.loss_before,
                 r.n_active_after, r.loss_after, r.upd_l1)
        for r in kg_transe_epoch(spark, SF).collect()
    }
    assert got == {p: tuple(v) + (upd_l1,) for p, v in agg.items()}


def test_transe_epoch_descends(spark):
    """One integer SGD step must reduce the total hinge loss on the
    training triples — the sign conventions are wrong otherwise — and
    the step must be non-trivial (some parameter actually moved)."""
    from csv_to_jsonld_processor_spark.kg.mlprep import kg_transe_epoch

    rows = kg_transe_epoch(spark, SF).collect()
    assert sum(r.loss_after for r in rows) < sum(r.loss_before for r in rows)
    assert rows[0].upd_l1 > 0
    assert all(r.n_triples >= r.n_active for r in rows)
