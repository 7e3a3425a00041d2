"""Phonology engine parity + property tests.

Parity is checked exhaustively against both reference analyzer variants over
a large synthetic corpus of real and adversarial words, plus the round-trip
property word -> (onset, medial, nucleus, coda, tone) -> word.
"""

import itertools
import os
import unicodedata

import pytest

from phoneme_vqa_tpu.phonology import (
    analyze,
    compose_word,
    decompose_non_vietnamese_word,
    get_rhyme,
    get_tone,
    is_vietnamese_3,
    is_vietnamese_5,
    preprocess_sentence,
    split_non_vietnamese_word,
)

from .reference_loader import REFERENCE_ROOT, load_reference_module

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
)

REAL_WORDS = (
    "gì gìn giếng giết chào bạn tôi là người việt nam hà nội thành phố "
    "hồ chí minh quán ăn ngon quá trời hoa quả thủy điện thuở xưa huế "
    "huệ nước mắm phở bún chả nem rán bánh mì đường phố xe máy ô tô "
    "trường học sách vở bút viết màu đỏ xanh vàng tím trắng đen nâu "
    "một hai ba bốn năm sáu bảy tám chín mười nghìn triệu tỷ đồng "
    "khuya khoắn ngoằn ngoèo khúc khuỷu quyết quyển xuyến chuyển "
    "nguyễn nguyệt yêu thương ưu tú ượp ươn oong boong xoong moóc "
    "giây giấy dây đây đấy ấy ơi ạ ừ ứ ị ọ ẹ loà xoà hoạ sĩ goá "
).split()

NON_VIET = (
    "hello world 123 covid-19 ok! xyz qwerty pizza 3d abc123 "
    "đđđ ngh tr ph q z w f j email.com n0n ăăă ôôô"
).split()

ADVERSARIAL = [
    # boundary/rule probes
    "ky", "cy", "ki", "ci", "ke", "ce", "ghe", "ge", "ghi", "gia",
    "nghe", "nge", "nghia", "ngia", "qua", "quy", "q", "qa",
    "oa", "hoa", "hoă", "oe", "ua", "uô", "muô", "mua", "muôn",
    "uya", "khuya", "ya", "yá", "yà", "uy", "tuy", "túy", "tùy",
    "oo", "xoong", "oong", "ooc", "mooc", "hooh",
    "iê", "miê", "miên", "yê", "yên", "ây", "tây", "ă", "ằ", "ăn",
    "ri", "rua", "roa", "gioa", "giua", "riêng",
    "mao", "meo", "mio", "muo", "may", "mây", "mấy", "miy",
    "mai", "măi", "mâi", "mii", "mei",
    "manh", "minh", "mênh", "monh", "munh",
    "mang", "mong", "mông", "mung", "mưng", "meng", "miêng", "mương",
    "mâng", "măng", "muông", "moong", "ming", "mying",
    "mach", "mich", "mêch", "mych", "moch",
    "mac", "mic", "mêc", "mec", "mơc", "moc",
    "mau", "miu", "meu", "mơu", "mou", "môu", "myu", "mău",
    "nana", "aa", "uu", "nn", "thuở", "quở", "huề", "huế", "huệ",
    "hỏa", "thủy", "thỏa", "gà", "gi", "gí", "gy",
]

TONED = []
for base in ["ma", "man", "hoa", "thuy", "qua", "mua", "muon", "khuya"]:
    for mark in ["̀", "́", "̃", "̉", "̣"]:
        # attach the tone on each vowel position
        for i, ch in enumerate(base):
            if ch in "aeiouy":
                TONED.append(
                    unicodedata.normalize("NFC", base[: i + 1] + mark + base[i + 1 :])
                )

ALL_WORDS = REAL_WORDS + NON_VIET + ADVERSARIAL + TONED


@needs_reference
def test_is_vietnamese_5_parity():
    ref = load_reference_module("decode/word_processing.py", "decode_wp")
    for w in ALL_WORDS:
        assert is_vietnamese_5(w) == ref.is_Vietnamese(w), w


@needs_reference
def test_is_vietnamese_3_parity():
    ref = load_reference_module(
        "core/tokenizer/modules/word_processing.py", "tok_wp"
    )
    for w in ALL_WORDS:
        assert is_vietnamese_3(w) == ref.is_Vietnamese(w), w


@needs_reference
def test_compose_word_parity():
    ref = load_reference_module("decode/word_processing.py", "decode_wp")
    tones = [None, "<blank>", "<huyền>", "<sắc>", "<ngã>", "<hỏi>", "<nặng>"]
    onsets = [None, "q", "th", "h", "ng"]
    medials = [None, "o", "u"]
    nuclei = [None, "a", "ê", "ơ", "uô", "iê", "ua"]
    codas = [None, "n", "ng", "i"]
    for o, m, n, c, t in itertools.product(onsets, medials, nuclei, codas, tones):
        assert compose_word(o, m, n, c, t) == ref.compose_word(o, m, n, c, t), (
            o, m, n, c, t,
        )


@needs_reference
def test_decompose_and_split_parity():
    ref5 = load_reference_module("decode/word_processing.py", "decode_wp")
    ref3 = load_reference_module(
        "core/tokenizer/modules/word_processing.py", "tok_wp"
    )
    for w in ALL_WORDS:
        assert decompose_non_vietnamese_word(w) == ref5.decompose_non_vietnamese_word(w), w
        assert split_non_vietnamese_word(w) == ref3.split_non_vietnamese_word(w), w
        assert get_rhyme(w) == ref3.get_rhyme(w), w


@needs_reference
def test_preprocess_sentence_parity():
    ref = load_reference_module("decode/word_processing.py", "decode_wp")
    sents = [
        "Xin Chào & Tạm_Biệt",
        "a;b/c\\d=e",
        "  nhiều   khoảng   trắng  ",
        "#hash~tilde|pipe",
    ]
    for s in sents:
        assert preprocess_sentence(s) == ref.preprocess_sentence(s), s


def test_round_trip_valid_syllables():
    """word -> 5-tuple -> compose_word reproduces the word (up to tone-mark
    placement canonicalization: old-style "loà" composes to "lòa"), and
    re-analysis of the composed form is a fixed point."""
    for w in ALL_WORDS:
        ok, parts = is_vietnamese_5(w.lower())
        if ok:
            composed = compose_word(*parts)
            ok2, parts2 = is_vietnamese_5(composed)
            assert ok2 and parts2 == parts, (w, composed)
            # canonical spellings round-trip exactly
            if composed != w.lower():
                # only tone placement may differ, never the letters
                strip = lambda s: get_tone(s)[1]
                assert strip(composed) == strip(w.lower()), (w, composed)


def test_known_analyses():
    assert is_vietnamese_5("gì") == (True, ("gi", None, "i", None, "<huyền>"))
    assert is_vietnamese_5("nước") == (True, ("n", None, "ươ", "c", "<sắc>"))
    assert is_vietnamese_5("quá") == (True, ("q", "u", "a", None, "<sắc>"))
    assert is_vietnamese_5("khuya") == (True, ("kh", "u", "ya", None, None))
    assert is_vietnamese_5("hello")[0] is False
    ok, (onset, rhyme, tone) = is_vietnamese_3("giếng")
    assert ok and onset == "gi" and rhyme == "iêng" and tone == "</>"


def test_tone_placement():
    # open syllable with medial: tone on the medial (hỏa) ...
    assert compose_word("h", "o", "a", None, "<hỏi>") == "hỏa"
    assert compose_word("th", "u", "y", None, "<hỏi>") == "thủy"
    # ... except ơ/ê nuclei and q-onsets (general rule)
    assert compose_word("th", "u", "ơ", None, "<hỏi>") == "thuở"
    assert compose_word("h", "u", "ê", None, "<nặng>") == "huệ"
    assert compose_word("q", "u", "a", None, "<sắc>") == "quá"
    # closed syllable: tone on the last vowel of the nucleus
    assert compose_word("n", None, "ươ", "c", "<sắc>") == "nước"
    # gii -> gi re-spelling
    assert compose_word("gi", None, "i", None, "<huyền>") == "gì"


@needs_reference
def test_fuzz_parity_random_strings():
    """Randomized parity sweep over strings from the Vietnamese alphabet."""
    import random

    ref5 = load_reference_module("decode/word_processing.py", "decode_wp")
    ref3 = load_reference_module(
        "core/tokenizer/modules/word_processing.py", "tok_wp"
    )
    alphabet = "aăâbcdđeêghiklmnoôơpqrstuưvxy"
    marks = ["", "̀", "́", "̃", "̉", "̣"]
    rng = random.Random(0)
    for _ in range(3000):
        n = rng.randint(1, 7)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        i = rng.randrange(len(s) + 1)
        s = unicodedata.normalize("NFC", s[:i] + rng.choice(marks) + s[i:])
        assert is_vietnamese_5(s) == ref5.is_Vietnamese(s), s
        assert is_vietnamese_3(s) == ref3.is_Vietnamese(s), s


def test_get_tone_strips_and_recomposes():
    tone, base = get_tone("tiếng")
    assert tone == "<sắc>" and base == "tiêng"
    tone, base = get_tone("ngang")
    assert tone is None and base == "ngang"


@needs_reference
def test_fuzz_parity_multi_tone_and_long():
    """Adversarial fuzz: multiple tone marks per word, long strings, mixed
    scripts — both analyzer variants must still match the reference."""
    import random

    ref5 = load_reference_module("decode/word_processing.py", "decode_wp")
    ref3 = load_reference_module(
        "core/tokenizer/modules/word_processing.py", "tok_wp"
    )
    alphabet = "aăâbcdđeêghiklmnoôơpqrstuưvxyz019!.-好ж"
    marks = ["̀", "́", "̃", "̉", "̣"]
    rng = random.Random(7)
    for _ in range(1500):
        n = rng.randint(1, 12)
        chars = [rng.choice(alphabet) for _ in range(n)]
        # sprinkle 0-3 tone marks at random positions
        for _ in range(rng.randint(0, 3)):
            chars.insert(rng.randrange(len(chars) + 1), rng.choice(marks))
        s = unicodedata.normalize("NFC", "".join(chars))
        assert is_vietnamese_5(s) == ref5.is_Vietnamese(s), repr(s)
        assert is_vietnamese_3(s) == ref3.is_Vietnamese(s), repr(s)
