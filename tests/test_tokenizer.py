"""Tokenizer unit tests.

Ports the reference's golden tests (tests/test_char_tokenizer.py:11-23) and
adds coverage for breathing-token semantics and the full IPA alphabet.
"""
from transformertts_tpu.text.tokenizer import Tokenizer
from transformertts_tpu.text.symbols import all_phonemes


def test_custom_alphabet_start_end():
    # alphabet 'ab c' de-dups+sorts to [' ', 'a', 'b', 'c'] → ids 1..4
    tokenizer = Tokenizer(alphabet=list('ab c'), model_breathing=False)
    assert tokenizer.start_token_index == 5
    assert tokenizer.end_token_index == 6
    assert tokenizer.vocab_size == 7

    seq = tokenizer('a b')
    assert seq == [5, 2, 1, 3, 6]
    assert tokenizer.decode(seq) == '>a b<'


def test_full_alphabet_indices_stable():
    tok = Tokenizer(add_start_end=False, model_breathing=False)
    assert tok.vocab_size == len(all_phonemes) + 1
    # pad is 0, first alphabet char is 1
    assert tok.idx_to_token[0] == '/'
    assert tok.idx_to_token[1] == all_phonemes[0]


def test_breathing_token():
    tok = Tokenizer(alphabet=list('ab c'), model_breathing=True)
    # breathing index is allocated after start/end
    assert tok.breathing_token_index == 7
    seq = tok('a b')
    # breathing prefix, then space expands to [space_id, breathing_id]
    assert seq == [5, 7, 2, 1, 7, 3, 6]
    assert tok.decode(seq) == '>@a @b<'


def test_no_start_end():
    tok = Tokenizer(alphabet=list('ab c'), add_start_end=False, model_breathing=False)
    assert tok('ab') == [2, 3]  # ' ' sorts first → 'a' is id 2
