"""Sharded device index: collective postings lookup parity."""
import numpy as np
import jax
from jax.sharding import Mesh


def test_device_index_lookup_matches_host(tmp_path):
    from exonerate_tpu.db.dataset import dataset_build
    from exonerate_tpu.db.index import Index, index_build
    from exonerate_tpu.db.device_index import DeviceIndex
    CALM = "/root/reference/test/data/cdna/calm.human.dna.fasta"
    esd = str(tmp_path / "d.esd.npz")
    esi = str(tmp_path / "d.esi.npz")
    dataset_build([CALM], esd)
    index_build(esd, esi, wordlen=12)
    index = Index(esi)

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs.reshape(8), ("dp",))
    dix = DeviceIndex(index, mesh, "dp")

    rng = np.random.default_rng(2)
    words = rng.choice(index.word_table,
                       size=min(64, len(index.word_table)),
                       replace=False).astype(np.int64)
    # add misses
    words = np.concatenate([words, np.array([0, 10**17], np.int64)])

    word_of, seqs, poss = dix.lookup_words(words)
    # host expectation
    exp_w, exp_s, exp_p = [], [], []
    for k, w in enumerate(words):
        s, p = index.lookup_word(int(w))
        exp_w.extend([k] * len(s))
        exp_s.extend(s.tolist())
        exp_p.extend(p.tolist())
    assert word_of.tolist() == exp_w
    assert seqs.tolist() == exp_s
    assert poss.tolist() == exp_p
