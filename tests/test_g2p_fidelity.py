"""Builtin-G2P fidelity floors against the frozen espeak-ng fixture.

The fixture (tests/fixtures/espeak_en_us_ipa.tsv) is hand-transcribed
approximate espeak-ng en-us ground truth — see its provenance header. These
floors catch regressions in text/g2p.py rules/lexicon, not absolute truth.
Measured values at the time of writing (scripts/measure_g2p_fidelity.py,
round 5, after the CMUdict-class table + the espeak-convention pass:
fixture-attested function-word destressing, AO→ɑː before ŋ/ɡ, unstressed-ER
elision before unstressed vowels, FORCE-class curated entries):
symbol similarity 1.000 (with stress) / 1.000 (stress-stripped), exact
match 1.000 / 1.000 — the full fixture reproduced word-for-word. Corpus
lexicon-any token coverage 1.00 (curated 0.57 + cmudict 0.34 + inflected
0.09), rule-path 0.00.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / 'scripts'))

from measure_g2p_fidelity import corpus_rates, fixture_agreement, CORPUS


def test_fixture_agreement_floors():
    f = fixture_agreement()
    assert f['n_words'] >= 150
    assert f['mean_symbol_similarity'] >= 0.99
    assert f['mean_symbol_similarity_no_stress'] >= 0.995
    assert f['exact_match_rate'] >= 0.98
    assert f['exact_match_rate_no_stress'] >= 0.98
    assert f['by_path']['lexicon']['mean_similarity_no_stress'] >= 0.99
    assert f['by_path']['cmudict']['mean_similarity_no_stress'] >= 0.99


def test_corpus_path_rates():
    r = corpus_rates(CORPUS)
    # curated irregulars alone still cover the majority of word TOKENS
    # (function words dominate token counts)
    assert r['lexicon_hit_rate'] >= 0.5
    # with the CMUdict-class table + morphology, nearly everything is a
    # dictionary pronunciation rather than letter-to-sound rules
    # (VERDICT r4 item 3 bar: >= 0.9)
    assert r['lexicon_any_rate'] >= 0.9
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


def test_morphology_derivations():
    """The inflection layer derives regular forms with the standard
    voicing-assimilation and flapping rules (espeak-like conventions)."""
    from transformertts_tpu.text import g2p
    cases = {
        'created': 'kɹiːˈeɪɾɪd',      # -ed after t -> flap + ɪd
        'states': 'stˈeɪts',           # voiceless final -> s
        'fathers': 'fˈɑːðɚz',          # voiced final -> z
        'places': 'plˈeɪsɪz',          # sibilant final -> ɪz
        'testing': 'tˈɛstɪŋ',          # -ing, no flap after s
        'cities': 'sˈɪɾiz',            # -ies from -y lemma
        'bigger': 'bˈɪɡɚ',             # doubled consonant stripped
        'highly': 'hˈaɪli',            # -ly
        "wouldn't": 'wˈʊdənt',         # contraction (direct entry)
        "senate's": 'sˈɛnəts',         # possessive
    }
    for word, want in cases.items():
        assert g2p.g2p_word(word) == want, (word, g2p.g2p_word(word), want)
    paths = {g2p.g2p_word_path(w) for w in
             ('created', 'states', 'cities', 'bigger')}
    assert paths == {'cmudict_inflected'}


def test_lexicon_entries_inside_inventory():
    """Import-time validation is also pinned here so a bad entry fails the
    suite, not just the first import in production."""
    from transformertts_tpu.text import lexicon_en
    from transformertts_tpu.text.symbols import all_phonemes
    inventory = set(all_phonemes)
    assert len(lexicon_en.LEXICON_EN) > 1000
    for word, ipa in lexicon_en.LEXICON_EN.items():
        assert all(c in inventory for c in ipa), (word, ipa)
