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


# ---------------------------------------------------------------------------
# espeak backend plumbing, tested against a FAKE espeak binary (the real one
# is absent in this image). The fake mimics the contract the batching path
# relies on: `-q --ipa --stdin` emits one IPA line per input line.
# ---------------------------------------------------------------------------

_FAKE_ESPEAK = r'''#!/usr/bin/env python3
import sys
args = sys.argv[1:]
lines = []
if '--stdin' in args:
    lines = [l for l in sys.stdin.read().split('\n')]
else:
    # last non-flag argument is the clause (per-clause fallback invocation)
    pos = [a for i, a in enumerate(args)
           if not a.startswith('-') and (i == 0 or args[i-1] != '-v')]
    lines = [pos[-1]] if pos else []
for l in lines:
    # "IPA": lowercase words with a fake stress mark prefix per word
    print(' '.join('ˈ' + w.lower() for w in l.split()))
'''


def _install_fake_espeak(tmp_path, monkeypatch, script=_FAKE_ESPEAK):
    import os
    import stat
    from transformertts_tpu.text import phonemizer as ph
    fake = tmp_path / 'espeak'
    fake.write_text(script)
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv('PATH', f'{tmp_path}:{os.environ["PATH"]}')
    ph._find_espeak.cache_clear()
    return ph


def test_espeak_single_text_batches_clauses(tmp_path, monkeypatch):
    ph = _install_fake_espeak(tmp_path, monkeypatch)
    p = ph.Phonemizer(language='en-us', with_stress=True, backend='espeak')
    out = p('hello there, friend! ok')
    # punctuation re-attached in order, clauses phonemized
    assert out == 'ˈhello ˈthere,ˈfriend!ˈok'
    p2 = ph.Phonemizer(language='en-us', with_stress=False, backend='espeak')
    assert p2('hello there, friend! ok') == 'hello there,friend!ok'
    ph._find_espeak.cache_clear()


def test_espeak_corpus_batch_matches_per_string(tmp_path, monkeypatch):
    ph = _install_fake_espeak(tmp_path, monkeypatch)
    p = ph.Phonemizer(language='en-us', with_stress=False, backend='espeak')
    texts = ['hello world.', 'a b c, d!', 'no punctuation here',
             '...', 'one? two! three.']
    batched = p(texts)
    singly = [p(t) for t in texts]
    assert batched == singly
    ph._find_espeak.cache_clear()


def test_espeak_line_count_mismatch_falls_back(tmp_path, monkeypatch):
    # a fake whose --stdin mode drops blank-ish output lines, desyncing the
    # pairing; the per-clause fallback must still produce correct output
    bad = _FAKE_ESPEAK.replace(
        "lines = [l for l in sys.stdin.read().split('\\n')]",
        "lines = [l for l in sys.stdin.read().split('\\n')][:1]")
    ph = _install_fake_espeak(tmp_path, monkeypatch, script=bad)
    p = ph.Phonemizer(language='en-us', with_stress=False, backend='espeak')
    out = p('alpha, beta! delta')
    assert out == 'alpha,beta!delta'
    ph._find_espeak.cache_clear()


def test_espeak_compensating_desync_detected(tmp_path, monkeypatch):
    """One clause emitting an EMPTY line while another splits into two keeps
    the total count correct — the old count-only check mis-paired the whole
    chunk. Empty lines must be kept and treated as a desync trigger."""
    weird = _FAKE_ESPEAK.replace(
        "for l in lines:\n"
        "    # \"IPA\": lowercase words with a fake stress mark prefix per word\n"
        "    print(' '.join('ˈ' + w.lower() for w in l.split()))",
        "for l in lines:\n"
        "    if '--stdin' in args and l.strip().startswith('zz'):\n"
        "        print('')          # espeak emitted nothing for this line\n"
        "    elif '--stdin' in args and l.strip().startswith('xx'):\n"
        "        print('split one')\n"
        "        print('split two')  # espeak broke the line in two\n"
        "    else:\n"
        "        print(' '.join('ˈ' + w.lower() for w in l.split()))")
    assert weird != _FAKE_ESPEAK, 'replacement target drifted'
    ph = _install_fake_espeak(tmp_path, monkeypatch, script=weird)
    p = ph.Phonemizer(language='en-us', with_stress=False, backend='espeak')
    # both pathological clauses in ONE chunk: count matches (1 empty + 2
    # split = 2 lines for 2 clauses after the old empty-filter), so only the
    # empty-line check catches it and forces the per-clause fallback
    out = p('zzfoo, xxbar')
    assert out == 'zzfoo,xxbar'
    ph._find_espeak.cache_clear()
