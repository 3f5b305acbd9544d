from transformertts_tpu.text import TextToTokens, Phonemizer
from transformertts_tpu.text.symbols import all_phonemes


def test_builtin_phonemizer_outputs_known_symbols():
    phon = Phonemizer(language='en-us', with_stress=True, backend='builtin')
    out = phon('Hello there, General - Kenobi! 4 lights?')
    assert isinstance(out, str)
    assert len(out) > 0
    for c in out:
        assert c in all_phonemes, f'unknown symbol {c!r}'


def test_punctuation_preserved_and_whitespace_collapsed():
    phon = Phonemizer(language='en-us', with_stress=False, backend='builtin')
    out = phon('Hello ,   world .')
    assert ',' in out and '.' in out
    assert '  ' not in out
    # no whitespace around punctuation
    assert ' ,' not in out and ' .' not in out


def test_list_input():
    phon = Phonemizer(language='en-us', with_stress=True, backend='builtin')
    out = phon(['one sentence.', 'another sentence!'])
    assert isinstance(out, list) and len(out) == 2


def test_text_to_tokens_roundtrip():
    pipeline = TextToTokens.default('en-us', add_start_end=False,
                                    with_stress=True, model_breathing=False,
                                    backend='builtin')
    tokens = pipeline('The quick brown fox.')
    assert isinstance(tokens, list)
    assert all(isinstance(t, int) and t > 0 for t in tokens)


def test_lexicon_entries_reachable():
    """Regression: two lexicon keys contained an invisible zero-width space
    (U+200B) and could never match real words."""
    from transformertts_tpu.text.g2p import _LEXICON, _FUNCTION_WORDS
    assert 'something' in _LEXICON and _LEXICON['something'] == 'sʌmθɪŋ'
    assert 'weren' in _LEXICON
    assert all(w.isascii() for w in _FUNCTION_WORDS)
    assert all('​' not in w for w in _LEXICON)
