"""Golden scores for the translated/codon/intron model family
(ref: src/model/*.test.c)."""
import pytest

from exonerate_tpu.alphabet import Alphabet, AlphabetType
from exonerate_tpu.engine.region import Region
from exonerate_tpu.engine import reference as ref_engine
from exonerate_tpu.model.data import AlignData
from exonerate_tpu.model.est2genome import est2genome_create
from exonerate_tpu.model.ner import ner_create
from exonerate_tpu.model.protein2dna import protein2dna_create
from exonerate_tpu.model.protein2genome import protein2genome_create
from exonerate_tpu.model.coding2coding import coding2coding_create
from exonerate_tpu.model.cdna2genome import cdna2genome_create
from exonerate_tpu.seqio import Sequence

DNA = Alphabet(AlphabetType.DNA)
PROTEIN = Alphabet(AlphabetType.PROTEIN)


def run(model, q, t, crib, translate_both=False, check_path=True):
    data = AlignData(q, t, translate_both)
    region = Region(0, 0, len(q), len(t))
    score = ref_engine.find_score(model, region, data)
    assert score == crib, f"score {score} != crib {crib}"
    if check_path:
        res = ref_engine.find_path(model, region, data)
        assert res.score == crib
    return score


def test_est2genome():
    # ref: src/model/est2genome.test.c:63 (score 157)
    q = Sequence("query", None,
                 "CGATCGATCGNATCGATCGATC" "CATCTATCTAGCGAGCGATCTA", DNA)
    t = Sequence("target", None,
                 "CGATCGATCGATCGATCGATC" "GT" + "N" * 162 + "AG"
                 "CATCTATCTANNNGCGAGCGATCTA", DNA)
    run(est2genome_create(), q, t, 157)


def test_protein2dna():
    # ref: src/model/protein2dna.test.c:34 (score 134)
    dna = Sequence("dna", None,
                   "ATGGCTGACCAGCTGACTGAGGAGCAGATT"
                   "GCAGAGTTCNAAGGAGGCCTTCTCCCTCTTT"
                   "GACAAGGATGGA"
                   "NNACTGTCCATAATTGC" "TGGTACTTCAGCGGTCGATGG"
                   "GATGGCACTCTGACCACC", DNA)
    protein = Sequence("protein", None,
                       "NNNNNNMADQLTEQIAEFKEAFSLFDKDG"
                       "TVHNC" "X" "WYFSGRW" "DGTITT", PROTEIN)
    run(protein2dna_create(), protein, dna, 134)


def test_protein2genome():
    # ref: src/model/protein2genome.test.c:34 (score 125)
    protein = Sequence("protein", None,
                       "MADQLTEQIAEFKEAFSLFDKDGDGTITT", PROTEIN)
    genome = Sequence("genome", None,
                      "ATGGCTGACCAGCTGACTGAGCAGATT"
                      "GCAGAGTTCAA"
                      "GT" + "N" * 43 + "AG"
                      "GGAGGCCTTCTCCCTCTTT"
                      "GACAAGGATGGAGATGGCACTATTACCACC", DNA)
    run(protein2genome_create(), protein, genome, 125)


def test_ner():
    # ref: src/model/ner.test.c:57 (score 208)
    q = Sequence("qy", None,
                 "TTTTATCTTCCCAAGAGNCCCCATNNNGCGA"
                 + "A" * 64 +
                 "GTGATTGAAATGTGGATGAAACATTTC", DNA)
    t = Sequence("tg", None,
                 "TTTTATCTTCCCAAGAGCCCCATGAGGCGA"
                 + "T" * 159 +
                 "GTGANTGAAATGTGGATGAACATTTC", DNA)
    run(ner_create(AlphabetType.DNA, AlphabetType.DNA), q, t, 208)


def test_coding2coding():
    # ref: src/model/coding2coding.test.c:35 (score 169)
    q = Sequence("qy", None,
                 "AGCCCAGCCAAGCACTGTCAGGAATCCTGTGAAGCAGCTCCAGCTATGTGTGAAGAAG"
                 "AGGACAGCACTGCCTTGGTGTGTGACAATGGCTCTGGGCTCTGTAAGGCCGGCTTTGCT",
                 DNA)
    t = Sequence("tg", None,
                 "AGCCCAGCCAAACACTGTCAGGAATCCTGT" "NNN"
                 "GAAGCAGCTCCAGCTATGTGTGAAGAAG"
                 "AGGACAGCACTGCCTTGGTGTGTGACAATGGC" "NN"
                 "TCTGGGCTCTGTAAGGCCGGCTTTGCT", DNA)
    run(coding2coding_create(), q, t, 169, translate_both=True)


@pytest.mark.slow
def test_cdna2genome():
    # ref: src/model/cdna2genome.test.c:35 (score 1281)
    q = Sequence("qyr", None,
                 "CGAGCTGAGTGGTTGTGTGGTCGCGTC"
                 "TCGGAAACCGGTAGCGCTTGCAGCATG"
                 "GCTGACCAACTGACTGAAGAGCAGATTGCAGAATTCAAAGAAGCTTTTTCATTA"
                 "GATGGTGATGGTCAAGTAAACTATGAAGAGTTTGTACAAATGATGACAGCAAAG"
                 "TGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGG"
                 "GATGGTGATGGCACTATAACAACAAAG"
                 "GAACTTGGGACTGTAATGAGATCTCTT", DNA)
    intron = "GT" + "N" * 51 + "AG"
    t = Sequence("tgr", None,
                 "GCCCAGGAGTTTGAGACCAGCCTGGGCAACAGACCGAGGCCCCGTCTCTACAAA"
                 "CGAGCTGAGTGGTTGTGTGGTCGCGTC"
                 + intron +
                 "TCGGAAACCGGTAGCGCTTGCAGCATG"
                 "GCTGACCAACTGACTGAAGAGCAGATTGCAGAATTCAAAGAAGCTTTTTCATTA"
                 + intron +
                 "GATGGTGATGGTCAAGTAAACTATGAAGAGTTTGTACAAATGATGACAGCAAAG"
                 "TGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGGTGG"
                 "GATGGTGATGGCACTATAACAACAAAG"
                 + intron +
                 "GAACTTGGGACTGTAATGAGATCTCTT"
                 "TCTTTTCCGCCAGGCTGCCCACAGGGTGGATATCGAAGTTTTCGGGCAGCTGGA",
                 DNA)
    run(cdna2genome_create(), q, t, 1281, translate_both=True,
        check_path=False)
