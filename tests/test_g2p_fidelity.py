"""Builtin-G2P fidelity floors against the frozen espeak-ng fixture.

The fixture (tests/fixtures/espeak_en_us_ipa.tsv) is hand-transcribed
approximate espeak-ng en-us ground truth — see its provenance header. These
floors catch regressions in text/g2p.py rules/lexicon, not absolute truth.
Measured values at the time of writing (scripts/measure_g2p_fidelity.py):
symbol similarity 0.89 (with stress) / 0.94 (stress-stripped), lexicon-path
0.97, corpus lexicon-hit rate 0.57.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / 'scripts'))

from measure_g2p_fidelity import corpus_rates, fixture_agreement, CORPUS


def test_fixture_agreement_floors():
    f = fixture_agreement()
    assert f['n_words'] >= 150
    assert f['mean_symbol_similarity'] >= 0.85
    assert f['mean_symbol_similarity_no_stress'] >= 0.90
    assert f['by_path']['lexicon']['mean_similarity_no_stress'] >= 0.95
    assert f['by_path']['rules']['mean_similarity_no_stress'] >= 0.85


def test_corpus_path_rates():
    r = corpus_rates(CORPUS)
    # common English prose: the curated lexicon should cover the majority
    # of word TOKENS (function words dominate token counts)
    assert r['lexicon_hit_rate'] >= 0.5
    # and nothing should come out fully unmapped
    assert r['fully_unmapped_word_rate'] == 0


def test_g2p_tokenizes_cleanly():
    """Every fixture word's builtin output must survive the tokenizer —
    i.e. stay inside the model alphabet (embedding-index contract)."""
    from measure_g2p_fidelity import load_fixture
    from transformertts_tpu.text.symbols import all_phonemes
    from transformertts_tpu.text import g2p
    inventory = set(all_phonemes)
    for word, _ in load_fixture():
        ipa = g2p.g2p_word(word)
        assert all(c in inventory for c in ipa), (word, ipa)
