"""Romanization / transliteration (SURVEY.md §2.8 T9).

The reference shells out to the uroman Perl script per string
(hamerkop/string.py:135-155), skipping English and pure-ASCII inputs.
This engine ships a deterministic pure-python romanizer with the same
contract (None for English/ASCII, else best-effort Latin): diacritic
folding plus per-script tables — Cyrillic, Greek, Arabic (incl.
Persian/Urdu letters), Ge'ez (generated syllabary), the Brahmic
abugidas Sinhala/Odia/Devanagari/Bengali (inherent vowel + virama +
dependent signs), kana (digraphs/sokuon/chouon), and arithmetic Hangul
decomposition; characters without a mapping pass through. Executed as
an Arrow-batched pandas UDF. The ASCII/English short-circuit exists at
two levels: the `when` guard in `romanize` fixes the OUTPUT (NULL) for
those rows, and `add_romanized` (DataFrame split-union) or the UDF's
internal isascii() fast path keep the WORK off them — a bare when()
cannot, because ExtractPythonUDFs evaluates python UDFs hoisted out of
conditionals.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "y", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
}
GREEK = {
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "i",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "o",
}

# Arabic script (incl. the Persian and Urdu extension letters). Short
# vowels are harakat — combining marks, dropped by the main loop exactly
# as uroman's output omits them for unvocalized text.
ARABIC = {
    "ا": "a", "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h",
    "خ": "kh", "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s",
    "ش": "sh", "ص": "s", "ض": "d", "ط": "t", "ظ": "z", "ع": "'",
    "غ": "gh", "ف": "f", "ق": "q", "ك": "k", "ل": "l", "م": "m",
    "ن": "n", "ه": "h", "و": "w", "ي": "y", "ء": "'", "آ": "a",
    "أ": "a", "ؤ": "'", "إ": "i", "ئ": "'", "ة": "h", "ى": "a",
    # Persian
    "پ": "p", "چ": "ch", "ژ": "zh", "گ": "g",
    # Urdu
    "ٹ": "t", "ڈ": "d", "ڑ": "r", "ں": "n", "ے": "e", "ک": "k",
    "ی": "y", "ھ": "h", "ہ": "h",
    "،": ",", "؟": "?", "؛": ";",
}

# Ge'ez (Ethiopic) is a syllabary: codepoints sit in series of 8
# (consonant x vowel order), so the table is generated, not hand-written.
# Orders: 1st(a-umlaut)->e, then u/i/a/ie, 6th (schwa/bare)->'', o, wa —
# the scheme that renders the common city/name forms (selam, adis abeba).
_ETHIOPIC_SERIES = [
    (0x1200, "h"), (0x1208, "l"), (0x1210, "h"), (0x1218, "m"),
    (0x1220, "s"), (0x1228, "r"), (0x1230, "s"), (0x1238, "sh"),
    (0x1240, "q"), (0x1250, "q"), (0x1260, "b"), (0x1268, "v"),
    (0x1270, "t"), (0x1278, "ch"), (0x1280, "h"), (0x1290, "n"),
    (0x1298, "ny"), (0x12A0, ""), (0x12A8, "k"), (0x12B8, "kh"),
    (0x12C8, "w"), (0x12D0, ""), (0x12D8, "z"), (0x12E0, "zh"),
    (0x12E8, "y"), (0x12F0, "d"), (0x12F8, "dd"), (0x1300, "j"),
    (0x1308, "g"), (0x1318, "gg"), (0x1320, "t"), (0x1328, "ch"),
    (0x1330, "p"), (0x1338, "ts"), (0x1340, "ts"), (0x1348, "f"),
    (0x1350, "p"),
]
_ETHIOPIC_ORDERS = ["e", "u", "i", "a", "ie", "", "o", "oa"]


def _ethiopic_table() -> dict:
    table = {}
    for base, cons in _ETHIOPIC_SERIES:
        for order, vowel in enumerate(_ETHIOPIC_ORDERS):
            ch = chr(base + order)
            # vowel-carrier series (glottal/pharyngeal) emit the vowel
            # alone; their 1st and 6th orders read as a / i
            if cons == "":
                syl = {0: "a", 5: "i"}.get(order, vowel)
            else:
                syl = cons + vowel
            table[ch] = syl
    return table


_TABLE = {**CYRILLIC, **GREEK, **ARABIC, **_ethiopic_table()}

# --- Brahmic abugidas (Sinhala, Odia): consonant carries an inherent
# 'a' unless followed by a virama (kills the vowel) or a dependent
# vowel sign (replaces it). Independent vowels go straight in _ABUGIDA
# standalone entries via VOWEL_SIGNS fall-through.
SINHALA_CONS = {
    "ක": "k", "ඛ": "kh", "ග": "g", "ඝ": "gh", "ඞ": "ng", "ඟ": "ng",
    "ච": "ch", "ඡ": "chh", "ජ": "j", "ඣ": "jh", "ඤ": "ny", "ඥ": "gn",
    "ට": "t", "ඨ": "th", "ඩ": "d", "ඪ": "dh", "ණ": "n", "ඬ": "nd",
    "ත": "t", "ථ": "th", "ද": "d", "ධ": "dh", "න": "n", "ඳ": "nd",
    "ප": "p", "ඵ": "ph", "බ": "b", "භ": "bh", "ම": "m", "ඹ": "mb",
    "ය": "y", "ර": "r", "ල": "l", "ව": "v", "ශ": "sh", "ෂ": "sh",
    "ස": "s", "හ": "h", "ළ": "l", "ෆ": "f",
}
ORIYA_CONS = {
    "କ": "k", "ଖ": "kh", "ଗ": "g", "ଘ": "gh", "ଙ": "ng",
    "ଚ": "ch", "ଛ": "chh", "ଜ": "j", "ଝ": "jh", "ଞ": "ny",
    "ଟ": "t", "ଠ": "th", "ଡ": "d", "ଢ": "dh", "ଣ": "n",
    "ତ": "t", "ଥ": "th", "ଦ": "d", "ଧ": "dh", "ନ": "n",
    "ପ": "p", "ଫ": "ph", "ବ": "b", "ଭ": "bh", "ମ": "m",
    "ଯ": "j", "ୟ": "y", "ର": "r", "ଲ": "l", "ଳ": "l",
    "ଵ": "v", "ୱ": "w", "ଶ": "sh", "ଷ": "sh", "ସ": "s", "ହ": "h",
}
DEVANAGARI_CONS = {
    "क": "k", "ख": "kh", "ग": "g", "घ": "gh", "ङ": "ng",
    "च": "ch", "छ": "chh", "ज": "j", "झ": "jh", "ञ": "ny",
    "ट": "t", "ठ": "th", "ड": "d", "ढ": "dh", "ण": "n",
    "त": "t", "थ": "th", "द": "d", "ध": "dh", "न": "n",
    "प": "p", "फ": "ph", "ब": "b", "भ": "bh", "म": "m",
    "य": "y", "र": "r", "ल": "l", "व": "v", "श": "sh",
    "ष": "sh", "स": "s", "ह": "h", "ळ": "l",
}
BENGALI_CONS = {
    "ক": "k", "খ": "kh", "গ": "g", "ঘ": "gh", "ঙ": "ng",
    "চ": "ch", "ছ": "chh", "জ": "j", "ঝ": "jh", "ঞ": "ny",
    "ট": "t", "ঠ": "th", "ড": "d", "ঢ": "dh", "ণ": "n",
    "ত": "t", "থ": "th", "দ": "d", "ধ": "dh", "ন": "n",
    "প": "p", "ফ": "ph", "ব": "b", "ভ": "bh", "ম": "m",
    "য": "j", "র": "r", "ল": "l", "শ": "sh", "ষ": "sh",
    "স": "s", "হ": "h", "ৰ": "r", "ৱ": "w", "য়": "y",
}
TAMIL_CONS = {
    "க": "k", "ங": "ng", "ச": "ch", "ஜ": "j", "ஞ": "ny",
    "ட": "t", "ண": "n", "த": "t", "ந": "n", "ன": "n",
    "ப": "p", "ம": "m", "ய": "y", "ர": "r", "ற": "r",
    "ல": "l", "ள": "l", "ழ": "zh", "வ": "v", "ஶ": "sh",
    "ஷ": "sh", "ஸ": "s", "ஹ": "h",
}
TELUGU_CONS = {
    "క": "k", "ఖ": "kh", "గ": "g", "ఘ": "gh", "ఙ": "ng",
    "చ": "ch", "ఛ": "chh", "జ": "j", "ఝ": "jh", "ఞ": "ny",
    "ట": "t", "ఠ": "th", "డ": "d", "ఢ": "dh", "ణ": "n",
    "త": "t", "థ": "th", "ద": "d", "ధ": "dh", "న": "n",
    "ప": "p", "ఫ": "ph", "బ": "b", "భ": "bh", "మ": "m",
    "య": "y", "ర": "r", "ల": "l", "వ": "v", "శ": "sh",
    "ష": "sh", "స": "s", "హ": "h", "ళ": "l", "ఱ": "r",
}
KANNADA_CONS = {
    "ಕ": "k", "ಖ": "kh", "ಗ": "g", "ಘ": "gh", "ಙ": "ng",
    "ಚ": "ch", "ಛ": "chh", "ಜ": "j", "ಝ": "jh", "ಞ": "ny",
    "ಟ": "t", "ಠ": "th", "ಡ": "d", "ಢ": "dh", "ಣ": "n",
    "ತ": "t", "ಥ": "th", "ದ": "d", "ಧ": "dh", "ನ": "n",
    "ಪ": "p", "ಫ": "ph", "ಬ": "b", "ಭ": "bh", "ಮ": "m",
    "ಯ": "y", "ರ": "r", "ಲ": "l", "ವ": "v", "ಶ": "sh",
    "ಷ": "sh", "ಸ": "s", "ಹ": "h", "ಳ": "l",
}
MALAYALAM_CONS = {
    "ക": "k", "ഖ": "kh", "ഗ": "g", "ഘ": "gh", "ങ": "ng",
    "ച": "ch", "ഛ": "chh", "ജ": "j", "ഝ": "jh", "ഞ": "ny",
    "ട": "t", "ഠ": "th", "ഡ": "d", "ഢ": "dh", "ണ": "n",
    "ത": "t", "ഥ": "th", "ദ": "d", "ധ": "dh", "ന": "n",
    "പ": "p", "ഫ": "ph", "ബ": "b", "ഭ": "bh", "മ": "m",
    "യ": "y", "ര": "r", "ല": "l", "വ": "v", "ശ": "sh",
    "ഷ": "sh", "സ": "s", "ഹ": "h", "ള": "l", "ഴ": "zh", "റ": "r",
}
# Khmer: coeng (U+17D2) prefixes a subscript consonant — structurally the
# virama slot in this loop: C1+coeng kills C1's inherent vowel and C2
# carries the syllable. First-series vowel values (a-series), best-effort.
KHMER_CONS = {
    "ក": "k", "ខ": "kh", "គ": "k", "ឃ": "kh", "ង": "ng",
    "ច": "ch", "ឆ": "chh", "ជ": "ch", "ឈ": "chh", "ញ": "nh",
    "ដ": "d", "ឋ": "th", "ឌ": "d", "ឍ": "th", "ណ": "n",
    "ត": "t", "ថ": "th", "ទ": "t", "ធ": "th", "ន": "n",
    "ប": "b", "ផ": "ph", "ព": "p", "ភ": "ph", "ម": "m",
    "យ": "y", "រ": "r", "ល": "l", "វ": "v", "ស": "s",
    "ហ": "h", "ឡ": "l", "អ": "a",
}
# Myanmar: inherent-vowel abugida; asat (U+103A) kills the vowel and the
# stacker (U+1039) forms conjuncts — both sit in VIRAMA. The medials
# ya/ra/wa/ha (U+103B-103E) replace the inherent vowel with glide+a.
MYANMAR_CONS = {
    "က": "k", "ခ": "kh", "ဂ": "g", "ဃ": "gh", "င": "ng",
    "စ": "s", "ဆ": "hs", "ဇ": "z", "ဈ": "z", "ဉ": "ny", "ည": "ny",
    "ဋ": "t", "ဌ": "ht", "ဍ": "d", "ဎ": "d", "ဏ": "n",
    "တ": "t", "ထ": "ht", "ဒ": "d", "ဓ": "d", "န": "n",
    "ပ": "p", "ဖ": "hp", "ဗ": "b", "ဘ": "b", "မ": "m",
    "ယ": "y", "ရ": "r", "လ": "l", "ဝ": "w", "သ": "th",
    "ဟ": "h", "ဠ": "l", "အ": "a",
}
_ABUGIDA_CONS = {
    **SINHALA_CONS, **ORIYA_CONS, **DEVANAGARI_CONS, **BENGALI_CONS,
    **TAMIL_CONS, **TELUGU_CONS, **KANNADA_CONS, **MALAYALAM_CONS,
    **KHMER_CONS, **MYANMAR_CONS,
}
# Dependent vowel signs: only these may replace a consonant's inherent
# 'a'. Independent vowels open their own syllable and live in
# STANDALONE, which also carries anusvara/visarga.
DEP_SIGNS = {
    # Sinhala
    "ා": "a", "ැ": "ae", "ෑ": "ae", "ි": "i", "ී": "i", "ු": "u",
    "ූ": "u", "ෘ": "ru", "ෙ": "e", "ේ": "e", "ෛ": "ai", "ො": "o",
    "ෝ": "o", "ෞ": "au",
    # Odia
    "ା": "a", "ି": "i", "ୀ": "i", "ୁ": "u", "ୂ": "u", "ୃ": "ru",
    "େ": "e", "ୈ": "ai", "ୋ": "o", "ୌ": "au",
    # Devanagari
    "ा": "a", "ि": "i", "ी": "i", "ु": "u", "ू": "u", "ृ": "ri",
    "े": "e", "ै": "ai", "ो": "o", "ौ": "au",
    # Bengali
    "া": "a", "ি": "i", "ী": "i", "ু": "u", "ূ": "u", "ৃ": "ri",
    "ে": "e", "ৈ": "ai", "ো": "o", "ৌ": "au",
    # Tamil
    "ா": "a", "ி": "i", "ீ": "i", "ு": "u", "ூ": "u",
    "ெ": "e", "ே": "e", "ை": "ai", "ொ": "o", "ோ": "o", "ௌ": "au",
    # Telugu
    "ా": "a", "ి": "i", "ీ": "i", "ు": "u", "ూ": "u", "ృ": "ru",
    "ె": "e", "ే": "e", "ై": "ai", "ొ": "o", "ో": "o", "ౌ": "au",
    # Kannada
    "ಾ": "a", "ಿ": "i", "ೀ": "i", "ು": "u", "ೂ": "u", "ೃ": "ru",
    "ೆ": "e", "ೇ": "e", "ೈ": "ai", "ೊ": "o", "ೋ": "o", "ೌ": "au",
    # Malayalam
    "ാ": "a", "ി": "i", "ീ": "i", "ു": "u", "ൂ": "u", "ൃ": "ru",
    "െ": "e", "േ": "e", "ൈ": "ai", "ൊ": "o", "ോ": "o", "ൌ": "au",
    # Khmer
    "ា": "a", "ិ": "i", "ី": "i", "ឹ": "oe", "ឺ": "eu", "ុ": "u",
    "ូ": "u", "ួ": "uo", "ើ": "ae", "ឿ": "oea", "ៀ": "ie",
    "េ": "e", "ែ": "ae", "ៃ": "ai", "ោ": "o", "ៅ": "au",
    # Myanmar vowel signs + medials (glide + inherent a)
    "ာ": "a", "ါ": "a", "ိ": "i", "ီ": "i", "ု": "u", "ူ": "u",
    "ေ": "e", "ဲ": "e", "ျ": "ya", "ြ": "ra", "ွ": "wa", "ှ": "ha",
    # Thai dependent (combining) vowels — consulted by the standalone
    # DEP_SIGNS branch, since Thai consonants carry no inherent vowel
    "ั": "a", "ิ": "i", "ี": "i", "ึ": "ue", "ื": "ue",
    "ุ": "u", "ู": "u",
    # Lao dependent vowels + signs
    "ັ": "a", "ິ": "i", "ີ": "i", "ຶ": "ue", "ື": "ue",
    "ຸ": "u", "ູ": "u", "ົ": "o", "ໍ": "o", "ຼ": "l",
}
STANDALONE = {
    # Sinhala independent vowels
    "අ": "a", "ආ": "a", "ඇ": "ae", "ඈ": "ae", "ඉ": "i", "ඊ": "i",
    "උ": "u", "ඌ": "u", "එ": "e", "ඒ": "e", "ඓ": "ai", "ඔ": "o",
    "ඕ": "o", "ඖ": "au",
    # Odia independent vowels
    "ଅ": "a", "ଆ": "a", "ଇ": "i", "ଈ": "i", "ଉ": "u", "ଊ": "u",
    "ଋ": "ru", "ଏ": "e", "ଐ": "ai", "ଓ": "o", "ଔ": "au",
    # Devanagari independent vowels
    "अ": "a", "आ": "a", "इ": "i", "ई": "i", "उ": "u", "ऊ": "u",
    "ऋ": "ri", "ए": "e", "ऐ": "ai", "ओ": "o", "औ": "au",
    # Bengali independent vowels
    "অ": "a", "আ": "a", "ই": "i", "ঈ": "i", "উ": "u", "ঊ": "u",
    "ঋ": "ri", "এ": "e", "ঐ": "ai", "ও": "o", "ঔ": "au",
    # Tamil independent vowels
    "அ": "a", "ஆ": "a", "இ": "i", "ஈ": "i", "உ": "u", "ஊ": "u",
    "எ": "e", "ஏ": "e", "ஐ": "ai", "ஒ": "o", "ஓ": "o", "ஔ": "au",
    # Telugu independent vowels
    "అ": "a", "ఆ": "a", "ఇ": "i", "ఈ": "i", "ఉ": "u", "ఊ": "u",
    "ఋ": "ru", "ఎ": "e", "ఏ": "e", "ఐ": "ai", "ఒ": "o", "ఓ": "o",
    "ఔ": "au",
    # Kannada independent vowels
    "ಅ": "a", "ಆ": "a", "ಇ": "i", "ಈ": "i", "ಉ": "u", "ಊ": "u",
    "ಋ": "ru", "ಎ": "e", "ಏ": "e", "ಐ": "ai", "ಒ": "o", "ಓ": "o",
    "ಔ": "au",
    # Malayalam independent vowels + chillu letters (vowelless finals)
    "അ": "a", "ആ": "a", "ഇ": "i", "ഈ": "i", "ഉ": "u", "ഊ": "u",
    "ഋ": "ru", "എ": "e", "ഏ": "e", "ഐ": "ai", "ഒ": "o", "ഓ": "o",
    "ഔ": "au",
    "ൺ": "n", "ൻ": "n", "ർ": "r", "ൽ": "l", "ൾ": "l", "ൿ": "k",
    # Khmer independent vowels
    "ឥ": "i", "ឦ": "i", "ឧ": "u", "ឩ": "u", "ឪ": "au", "ឫ": "ru",
    "ឭ": "lu", "ឯ": "e", "ឱ": "o", "ឳ": "au",
    # Myanmar independent vowels
    "ဣ": "i", "ဤ": "i", "ဥ": "u", "ဦ": "u", "ဧ": "e", "ဩ": "o",
    "ဪ": "au",
    # Thai consonants (no inherent-vowel inference — uroman-style
    # best-effort letter mapping; tone marks are combining and drop) +
    # spacing vowels
    "ก": "k", "ข": "kh", "ฃ": "kh", "ค": "kh", "ฅ": "kh", "ฆ": "kh",
    "ง": "ng", "จ": "ch", "ฉ": "ch", "ช": "ch", "ซ": "s", "ฌ": "ch",
    "ญ": "y", "ฎ": "d", "ฏ": "t", "ฐ": "th", "ฑ": "th", "ฒ": "th",
    "ณ": "n", "ด": "d", "ต": "t", "ถ": "th", "ท": "th", "ธ": "th",
    "น": "n", "บ": "b", "ป": "p", "ผ": "ph", "ฝ": "f", "พ": "ph",
    "ฟ": "f", "ภ": "ph", "ม": "m", "ย": "y", "ร": "r", "ฤ": "rue",
    "ล": "l", "ฦ": "lue", "ว": "w", "ศ": "s", "ษ": "s", "ส": "s",
    "ห": "h", "ฬ": "l", "อ": "o", "ฮ": "h",
    "ะ": "a", "า": "a", "ำ": "am", "เ": "e", "แ": "ae", "โ": "o",
    "ใ": "ai", "ไ": "ai",
    # Lao consonants + spacing vowels
    "ກ": "k", "ຂ": "kh", "ຄ": "kh", "ງ": "ng", "ຈ": "ch", "ສ": "s",
    "ຊ": "s", "ຍ": "ny", "ດ": "d", "ຕ": "t", "ຖ": "th", "ທ": "th",
    "ນ": "n", "ບ": "b", "ປ": "p", "ຜ": "ph", "ຝ": "f", "ພ": "ph",
    "ຟ": "f", "ມ": "m", "ຢ": "y", "ຣ": "r", "ລ": "l", "ວ": "v",
    "ຫ": "h", "ອ": "o", "ຮ": "h",
    "ະ": "a", "າ": "a", "ຳ": "am", "ເ": "e", "ແ": "ae", "ໂ": "o",
    "ໃ": "ai", "ໄ": "ai", "ຽ": "ia",
}
# anusvara / visarga / candrabindu by EXPLICIT codepoint: the glyphs are
# cross-script lookalikes (Sinhala U+0D82 renders like Bengali U+0982),
# so literal characters here invite silent wrong-script entries
for _cp, _v in [
    (0x0D82, "n"), (0x0D83, "h"),  # Sinhala
    (0x0B01, "n"), (0x0B02, "n"), (0x0B03, "h"),  # Odia
    (0x0901, "n"), (0x0902, "n"), (0x0903, "h"),  # Devanagari
    (0x0981, "n"), (0x0982, "n"), (0x0983, "h"),  # Bengali
    (0x0B82, "n"), (0x0B83, "h"),  # Tamil
    (0x0C02, "n"), (0x0C03, "h"),  # Telugu
    (0x0C82, "n"), (0x0C83, "h"),  # Kannada
    (0x0D02, "m"), (0x0D03, "h"),  # Malayalam (anusvara reads m)
    (0x17C6, "m"),  # Khmer nikahit
    (0x1036, "n"),  # Myanmar anusvara
]:
    STANDALONE[chr(_cp)] = _v
# virama / pulli / coeng / asat+stacker: the inherent-vowel killers
VIRAMA = {
    "්", "୍", "्", "্",  # Sinhala, Odia, Devanagari, Bengali
    "்", "్", "್", "്",  # Tamil, Telugu, Kannada, Malayalam
    "្",  # Khmer coeng
    "္", "်",  # Myanmar stacker + asat
}

# --- Kana (hiragana table; katakana folds onto it by the 0x60 offset).
# Hepburn-ish: digraphs (きゃ -> kya, しゃ -> sha), sokuon gemination
# (っ doubles the next consonant), chouon (ー repeats the last vowel).
_KANA = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "を": "wo", "ん": "n", "ゔ": "vu",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
}
_KANA_SMALL_Y = {"ゃ": "a", "ゅ": "u", "ょ": "o"}


def _fold_katakana(ch: str) -> str:
    return chr(ord(ch) - 0x60) if "ァ" <= ch <= "ヶ" else ch


# --- Hangul syllables decompose arithmetically (Revised-Romanization
# style jamo values; contested finals use their common RR forms).
_HANGUL_LEADS = ["g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s",
                 "ss", "", "j", "jj", "ch", "k", "t", "p", "h"]
_HANGUL_VOWELS = ["a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o",
                  "wa", "wae", "oe", "yo", "u", "wo", "we", "wi", "yu",
                  "eu", "ui", "i"]
_HANGUL_TAILS = ["", "k", "kk", "ks", "n", "nj", "nh", "t", "l", "lk",
                 "lm", "lp", "ls", "lt", "lp", "lh", "m", "p", "ps",
                 "t", "ss", "ng", "t", "ch", "k", "t", "p", "h"]


def _hangul_syllable(ch: str) -> str | None:
    cp = ord(ch)
    if not 0xAC00 <= cp <= 0xD7A3:
        return None
    off = cp - 0xAC00
    lead, rem = divmod(off, 21 * 28)
    vowel, tail = divmod(rem, 28)
    return _HANGUL_LEADS[lead] + _HANGUL_VOWELS[vowel] + _HANGUL_TAILS[tail]


def romanize_py(s: str) -> str:
    """Best-effort deterministic romanization of one string.

    NFKC folds compatibility forms into their mapped equivalents BEFORE
    the table walk (halfwidth katakana -> kana, circled/ligature forms
    -> base letters — idempotence demands first-pass mapping) while its
    canonical composition keeps two-part Indic vowel signs composed
    (ො must not split into e + aa); remaining table misses fall back to
    per-char NFKD so accented Latin/Greek/Cyrillic still fold (é -> e,
    ή -> η -> i). Abugida consonants look ahead past nuktas: virama
    suppresses the inherent 'a', a dependent vowel sign replaces it.
    ZWJ/ZWNJ (ligature controls) are dropped."""
    chars = unicodedata.normalize("NFKC", s).replace("‌", "").replace(
        "‍", ""
    )
    out = []
    i, n = 0, len(chars)
    while i < n:
        ch = chars[i]
        if ch in _ABUGIDA_CONS:
            base = _ABUGIDA_CONS[ch]
            j = i + 1
            while (
                j < n
                and chars[j] not in DEP_SIGNS
                and chars[j] not in VIRAMA
                and unicodedata.combining(chars[j])
            ):
                j += 1  # nukta and friends sit between consonant and sign
            nxt = chars[j] if j < n else None
            if nxt in VIRAMA:
                out.append(base)
                i = j + 1
                continue
            if nxt in DEP_SIGNS:
                out.append(base + DEP_SIGNS[nxt])
                i = j + 1
                continue
            out.append(base + "a")
            i = j
            continue
        kh = _fold_katakana(ch)
        if kh in _KANA:
            base = _KANA[kh]
            nxt = _fold_katakana(chars[i + 1]) if i + 1 < n else ""
            if nxt in _KANA_SMALL_Y and base.endswith("i"):
                stem = base[:-1]
                y = _KANA_SMALL_Y[nxt]
                out.append(
                    stem + y if stem in ("sh", "ch", "j") else stem + "y" + y
                )
                i += 2
                continue
            out.append(base)
            i += 1
            continue
        if kh == "っ":  # sokuon: geminate the next syllable's consonant
            nxt = _fold_katakana(chars[i + 1]) if i + 1 < n else ""
            if nxt in _KANA and _KANA[nxt][0] not in "aiueon":
                out.append(_KANA[nxt][0])
            i += 1
            continue
        if ch == "ー":  # chouon: repeat the previous vowel
            if out and out[-1] and out[-1][-1] in "aiueo":
                out.append(out[-1][-1])
            i += 1
            continue
        hangul = _hangul_syllable(ch)
        if hangul is not None:
            out.append(hangul)
            i += 1
            continue
        if ch in STANDALONE:
            out.append(STANDALONE[ch])
            i += 1
            continue
        if ch in DEP_SIGNS:
            out.append(DEP_SIGNS[ch])
            i += 1
            continue
        if ch in VIRAMA:
            i += 1
            continue
        if unicodedata.combining(ch):
            i += 1
            continue
        low = ch.lower()
        if low in _TABLE:
            rep = _TABLE[low]
            out.append(rep.capitalize() if ch.isupper() and rep else rep)
        else:
            # per-char NFKD: fold diacritics, then retry every table —
            # decomposition can surface kana (ヷ -> ワ + dakuten) or
            # letters just as the main loop would have seen them
            for sub in unicodedata.normalize("NFKD", ch):
                if unicodedata.combining(sub):
                    continue
                subk = _fold_katakana(sub)
                if subk in _KANA:
                    out.append(_KANA[subk])
                    continue
                sub_hangul = _hangul_syllable(sub)
                if sub_hangul is not None:
                    out.append(sub_hangul)
                    continue
                sl = sub.lower()
                if sl in _TABLE:
                    rep = _TABLE[sl]
                    out.append(
                        rep.capitalize() if sub.isupper() and rep else rep
                    )
                else:
                    out.append(sub)
        i += 1
    return "".join(out)


@F.pandas_udf(StringType())
def romanize_udf(s: pd.Series) -> pd.Series:
    # ASCII fast path INSIDE the UDF: Catalyst's ExtractPythonUDFs
    # evaluates python UDFs unconditionally — even inside the otherwise()
    # of a when() guard — so ASCII rows DO cross Arrow into this worker.
    # str.isascii() is a C-speed byte scan, so the crossing costs
    # serialization only, never the romanization table walk. (The when()
    # guard in romanize() decides the SEMANTICS — ASCII rows still come
    # out NULL — it just cannot prevent the evaluation.)
    return s.map(
        lambda x: None if x is None else (x if x.isascii() else romanize_py(x))
    )


def romanize(string_col: Column, lang_col: Column) -> Column:
    """The T9 projector function for preprocess.name_projector: None for
    English docs and pure-ASCII strings (string.py:145-150).

    The native `when` guard fixes the OUTPUT for those rows; it does
    NOT skip the Python crossing — ExtractPythonUDFs hoists the UDF out
    of the conditional and evaluates it per row regardless (verified),
    so the UDF itself carries an isascii() fast path and a fully-Latin
    corpus pays Arrow serialization but no romanization work. To avoid
    the crossing entirely on mostly-ASCII corpora, use
    `add_romanized`, which routes only non-ASCII rows through the
    UDF."""
    is_ascii = string_col.rlike(r"^[\x00-\x7F]*$")
    return F.when(
        (lang_col == "eng") | is_ascii, F.lit(None).cast("string")
    ).otherwise(romanize_udf(string_col))


def add_romanized(
    df, string_col: str, lang_col: str, out_col: str = "translit_string"
):
    """DataFrame-level T9 with a REAL ASCII short-circuit: split the
    frame on the ASCII/English guard, run the pandas UDF only on the
    non-ASCII partition, union back. Unlike the expression form
    (`romanize`), guarded rows genuinely never cross Arrow — the shape
    to use when most of the corpus is Latin-script."""
    guard = (F.col(lang_col) == "eng") | F.col(string_col).rlike(
        r"^[\x00-\x7F]*$"
    )
    skip = df.where(guard).withColumn(
        out_col, F.lit(None).cast("string")
    )
    roman = df.where(~guard).withColumn(
        out_col, romanize_udf(F.col(string_col))
    )
    return skip.unionByName(roman)
