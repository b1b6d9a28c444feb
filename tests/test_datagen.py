"""Generator determinism: driver-side pandas path == distributed mapInPandas
path, row for row (FIXTURES.md §5)."""

import numpy as np

from audio_feature_extraction_spark import datagen as dg
from tests.conftest import sort_kv


def test_driver_vs_distributed_identity(spark, tiny_pdf):
    seq_pdf, _ = tiny_pdf
    a = sort_kv(seq_pdf)
    b = sort_kv(dg.gen_sequences(spark, dg.TINY).toPandas())
    assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
    assert (a.n_tok.to_numpy() == b.n_tok.to_numpy()).all()
    assert (a.source.to_numpy() == b.source.to_numpy()).all()
    assert (a.ts.to_numpy() == b.ts.to_numpy()).all()
    va, vb = a.value.to_numpy(), b.value.to_numpy()
    assert ((va == vb) | (np.isnan(va) & np.isnan(vb))).all()
    for x, y in zip(a.tokens, b.tokens):
        assert np.array_equal(np.asarray(x, np.int64), np.asarray(y, np.int64))


def test_reference_identity_and_missing_partners(spark, tiny_pdf):
    _, ref_pdf = tiny_pdf
    b = dg.gen_reference(spark, dg.TINY).toPandas()
    a = ref_pdf.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    b = b.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
    assert (a.ts.to_numpy() == b.ts.to_numpy()).all()
    for x, y in zip(a.ref_vec, b.ref_vec):
        assert np.allclose(np.asarray(x), np.asarray(y))
    # missing-partner docs exist (anti-join case J2)
    seq_docs = set(dg.gen_sequences_pdf(dg.TINY).doc_id)
    ref_docs = set(a.doc_id)
    assert ref_docs < seq_docs


def test_skew_and_shape(tiny_pdf):
    seq_pdf, _ = tiny_pdf
    share = (seq_pdf.source == dg.SKEW_SOURCE).mean()
    assert share > 0.4  # hot key present
    assert seq_pdf.ts.duplicated().any() or True  # ties likely but not required
    assert (seq_pdf.n_tok >= dg.TINY.min_tok).all()
    assert all(np.asarray(t).dtype == np.int32 for t in seq_pdf.tokens)
