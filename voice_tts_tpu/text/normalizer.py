"""Text normalization (zh + en) without WeTextProcessing.

The reference delegates Chinese/English TN to compiled OpenFst grammars
(`utils/front.py:100-111`, `tagger_cache/*.fst`).  Those artifacts and their
CPython bindings are unavailable here, so this module implements the
normalization rules natively: punctuation canonicalization (the reference's
`char_rep_map`), pinyin-tone and person-name preservation (same regex
machinery as `front.py:62-76,191-228`), plus rule-based verbalization of
numbers, dates, times, percentages and currency for zh, and number spelling
for en.  The rule surface is a strict subset of WeTextProcessing but covers
the README examples.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# punctuation canonicalization (reference `front.py:15-55`)
# ---------------------------------------------------------------------------

CHAR_REP_MAP = {
    "：": ",", "；": ",", ";": ",", "，": ",", "。": ".", "！": "!", "？": "?",
    "\n": " ", "·": "-", "、": ",", "...": "…", ",,,": "…", "，，，": "…",
    "……": "…", "“": "'", "”": "'", '"': "'", "‘": "'", "’": "'", "（": "'",
    "）": "'", "(": "'", ")": "'", "《": "'", "》": "'", "【": "'", "】": "'",
    "[": "'", "]": "'", "—": "-", "～": "-", "~": "-", "「": "'", "」": "'",
    ":": ",",
}
ZH_CHAR_REP_MAP = {"$": ".", **CHAR_REP_MAP}

PINYIN_TONE_PATTERN = (
    r"(?<![a-z])((?:[bpmfdtnlgkhjqxzcsryw]|[zcs]h)?"
    r"(?:[aeiouüv]|[ae]i|u[aio]|ao|ou|i[aue]|[uüv]e|[uvü]ang?|uai|[aeiuv]n"
    r"|[aeio]ng|ia[no]|i[ao]ng)|ng|er)([1-5])"
)
NAME_PATTERN = r"[一-鿿]+(?:[-·—][一-鿿]+){1,2}"
ENGLISH_CONTRACTION_PATTERN = r"(what|where|who|which|how|t?here|it|s?he|that|this)'s"

# ---------------------------------------------------------------------------
# number verbalization
# ---------------------------------------------------------------------------

_ZH_DIGITS = "零一二三四五六七八九"
_ZH_UNITS = ["", "十", "百", "千"]
_ZH_GROUPS = ["", "万", "亿", "万亿"]


def zh_read_digits(digits: str) -> str:
    """Digit-by-digit reading: '135' -> '一三五'."""
    return "".join(_ZH_DIGITS[int(d)] for d in digits if d.isdigit())


def zh_read_integer(num: int) -> str:
    """Standard Chinese integer reading: 10250 -> 一万零二百五十.

    Uses the native C++ core (`native/tn_core.cpp`) when built; this Python
    path is the reference implementation and fallback."""
    from voice_tts_tpu.text import native_tn
    native = native_tn.zh_read_integer(num)
    if native is not None:
        return native
    if num == 0:
        return "零"
    if num < 0:
        return "负" + zh_read_integer(-num)
    groups = []
    while num > 0:
        groups.append(num % 10000)
        num //= 10000
    parts: List[str] = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            continue
        text = ""
        zero_pending = False
        for pos in range(3, -1, -1):
            d = (g // 10 ** pos) % 10
            if d == 0:
                if text:
                    zero_pending = True
                continue
            if zero_pending:
                text += "零"
                zero_pending = False
            if not (pos == 1 and d == 1 and not text and gi == len(groups) - 1
                    and g < 20):
                text += _ZH_DIGITS[d]
            text += _ZH_UNITS[pos]
        # leading zero between groups (e.g. 10000200 -> ...万零二百)
        if parts and groups[gi + 1] != 0 and g < 1000:
            text = "零" + text
        parts.append(text + _ZH_GROUPS[gi])
    return "".join(parts)


def zh_read_number(token: str) -> str:
    """Read a decimal number string in Chinese."""
    neg = token.startswith("-")
    token = token.lstrip("+-").replace(",", "")
    if "." in token:
        int_part, frac = token.split(".", 1)
        text = zh_read_integer(int(int_part or "0")) + "点" + zh_read_digits(frac)
    else:
        text = zh_read_integer(int(token))
    return ("负" if neg else "") + text


_EN_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
            "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
            "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_EN_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
            "eighty", "ninety"]


def en_read_integer(num: int) -> str:
    from voice_tts_tpu.text import native_tn
    native = native_tn.en_read_integer(num)
    if native is not None:
        return native
    if num < 0:
        return "minus " + en_read_integer(-num)
    if num < 20:
        return _EN_ONES[num]
    if num < 100:
        tens, ones = divmod(num, 10)
        return _EN_TENS[tens] + ("-" + _EN_ONES[ones] if ones else "")
    for value, name in [(10 ** 9, "billion"), (10 ** 6, "million"),
                        (10 ** 3, "thousand"), (100, "hundred")]:
        if num >= value:
            head = en_read_integer(num // value) + " " + name
            rest = num % value
            return head + (" " + en_read_integer(rest) if rest else "")
    return str(num)


def en_read_number(token: str) -> str:
    token = token.replace(",", "")
    if "." in token:
        int_part, frac = token.split(".", 1)
        digits = " ".join(_EN_ONES[int(d)] for d in frac if d.isdigit())
        return en_read_integer(int(int_part or "0")) + " point " + digits
    return en_read_integer(int(token))


# ---------------------------------------------------------------------------
# zh rules
# ---------------------------------------------------------------------------

def _zh_verbalize(text: str) -> str:
    # dates: 2025年01月11日 / 2025/1/2
    def date_ymd(m):
        y, mo, d = m.group(1), int(m.group(2)), int(m.group(3))
        return (zh_read_digits(y) + "年" + zh_read_integer(mo) + "月"
                + zh_read_integer(d) + "日")

    text = re.sub(r"(\d{4})年(\d{1,2})月(\d{1,2})[日号]", date_ymd, text)
    text = re.sub(r"(\d{4})/(\d{1,2})/(\d{1,2})", lambda m: date_ymd(m), text)
    text = re.sub(r"(\d{4})[-~](\d{4})年",
                  lambda m: zh_read_digits(m.group(1)) + "到"
                  + zh_read_digits(m.group(2)) + "年", text)
    text = re.sub(r"(\d{4})年",
                  lambda m: zh_read_digits(m.group(1)) + "年", text)

    # times: 20:00 / 8:30
    def time_hm(m):
        h, mi = int(m.group(1)), int(m.group(2))
        out = zh_read_integer(h) + "点"
        if mi:
            out += zh_read_integer(mi) + "分"
        if m.group(3):
            out += zh_read_integer(int(m.group(3))) + "秒"
        return out

    text = re.sub(r"(\d{1,2}):(\d{2})(?::(\d{2}))?", time_hm, text)

    # phone-like digit runs with separators: 135-4567-8900 (1 reads 幺)
    def phone(m):
        return zh_read_digits(re.sub(r"\D", "", m.group(0))).replace("一", "幺")

    text = re.sub(r"\d{3,4}-\d{3,4}-\d{3,4}", phone, text)
    text = re.sub(r"(?<!\d)1[3-9]\d{9}(?!\d)", phone, text)  # bare mobile no.

    # fractions: 3/4 -> 四分之三
    text = re.sub(r"(?<![\d/])(\d{1,4})/(\d{1,4})(?![\d/])",
                  lambda m: zh_read_integer(int(m.group(2))) + "分之"
                  + zh_read_integer(int(m.group(1))), text)

    # temperature: -5°C / 36.5℃ (negative reads 零下)
    def temp(m):
        sign = "零下" if m.group(1) else ""
        return sign + zh_read_number(m.group(2)) + "摄氏度"

    text = re.sub(r"(-|零下)?(\d+(?:\.\d+)?)\s*(?:°C|℃)", temp, text)

    # percent ranges: 10%~20% / 10~20%  -> 百分之十到百分之二十
    text = re.sub(r"(\d+(?:\.\d+)?)%?[-~](\d+(?:\.\d+)?)%",
                  lambda m: "百分之" + zh_read_number(m.group(1)) + "到百分之"
                  + zh_read_number(m.group(2)), text)

    # numeric ranges: 3-5个 / 10~20天 (after phone rules so separator-digit
    # runs of phone shape are already consumed)
    def rng(m):
        a, b = m.group(1), m.group(2)
        if "." in a or "." in b:
            return zh_read_number(a) + "到" + zh_read_number(b)
        return zh_read_integer(int(a)) + "到" + zh_read_integer(int(b))

    text = re.sub(r"(?<![\d.-])(\d{1,4}(?:\.\d+)?)[-~](\d{1,4}(?:\.\d+)?)"
                  r"(?![\d.-])", rng, text)

    # measure units (WeTextProcessing measure class, common subset)
    units = {"km": "千米", "kg": "千克", "cm": "厘米", "mm": "毫米",
             "ml": "毫升", "mg": "毫克", "m²": "平方米", "㎡": "平方米",
             "m³": "立方米", "km/h": "千米每小时",
             # lowercase g only: 3.2g -> 三点二克, while 5G(网络) stays
             "g": "克"}
    unit_pat = "|".join(sorted((re.escape(u) for u in units), key=len,
                               reverse=True))
    text = re.sub(r"(\d+(?:\.\d+)?)\s*(" + unit_pat + r")(?![a-zA-Z])",
                  lambda m: zh_read_number(m.group(1)) + units[m.group(2)],
                  text)

    # percent / currency
    text = re.sub(r"(\d+(?:\.\d+)?)%",
                  lambda m: "百分之" + zh_read_number(m.group(1)), text)
    text = re.sub(r"[¥￥](\d+(?:\.\d+)?)",
                  lambda m: zh_read_number(m.group(1)) + "元", text)
    text = re.sub(r"\$(\d+(?:\.\d+)?)",
                  lambda m: zh_read_number(m.group(1)) + "美元", text)

    # plain numbers
    text = re.sub(r"\d+(?:\.\d+)?", lambda m: zh_read_number(m.group(0)), text)
    return text


def _en_verbalize(text: str) -> str:
    def time_hm(m):
        h, mi = int(m.group(1)), int(m.group(2))
        out = en_read_integer(h)
        if mi == 0:
            out += " o'clock"
        else:
            out += " " + ("oh " + en_read_integer(mi) if mi < 10
                          else en_read_integer(mi))
        return out

    text = re.sub(r"(\d{1,2}):(\d{2})\b", time_hm, text)

    # ordinals: 1st -> first, 23rd -> twenty-third
    _ORD_IRREG = {"one": "first", "two": "second", "three": "third",
                  "five": "fifth", "eight": "eighth", "nine": "ninth",
                  "twelve": "twelfth"}

    def ordinal(m):
        words = en_read_integer(int(m.group(1)))
        head, sep, last = (words.rpartition("-") if "-" in words.rsplit(" ", 1)[-1]
                           else words.rpartition(" "))
        if last in _ORD_IRREG:
            last = _ORD_IRREG[last]
        elif last.endswith("y"):
            last = last[:-1] + "ieth"
        else:
            last = last + "th"
        return head + sep + last

    text = re.sub(r"\b(\d+)(?:st|nd|rd|th)\b", ordinal, text)
    text = re.sub(r"(\d+(?:\.\d+)?)%",
                  lambda m: en_read_number(m.group(1)) + " percent", text)
    text = re.sub(r"\$(\d+(?:\.\d+)?)",
                  lambda m: en_read_number(m.group(1)) + " dollars", text)
    # split letter-digit boundaries so "beta2" reads "beta two" and
    # "F5-TTS" reads "f five-tts" (reference `front.py:473-476` cases)
    text = re.sub(r"([a-zA-Z])(\d)", r"\1 \2", text)
    text = re.sub(r"(\d)([a-zA-Z])", r"\1 \2", text)
    text = re.sub(r"\d+(?:\.\d+)?(?:,\d{3})*",
                  lambda m: en_read_number(m.group(0)), text)
    return text


class TextNormalizer:
    """Reference-compatible surface: `load()` + `normalize(text)`
    (`utils/front.py:11-228`)."""

    def __init__(self):
        self.loaded = False

    def load(self):
        self.loaded = True

    def match_email(self, email: str) -> bool:
        return re.match(r"^[a-zA-Z0-9]+@[a-zA-Z0-9]+\.[a-zA-Z]+$", email) is not None

    def use_chinese(self, s: str) -> bool:
        has_chinese = bool(re.search(r"[一-鿿]", s))
        has_alpha = bool(re.search(r"[a-zA-Z]", s))
        if has_chinese or not has_alpha or self.match_email(s):
            return True
        return bool(re.search(PINYIN_TONE_PATTERN, s, re.IGNORECASE))

    # -- placeholder save/restore (same scheme as the reference) --------
    def _save(self, text: str, pattern: str, tag: str) -> Tuple[str, List[str]]:
        found = re.findall(pattern, text, re.IGNORECASE)
        if not found:
            return text, []
        items = list(dict.fromkeys("".join(f) for f in found))
        for i, item in enumerate(items):
            text = text.replace(item, f"<{tag}_{chr(ord('a') + i)}>")
        return text, items

    def _restore(self, text: str, items: List[str], tag: str,
                 transform=None) -> str:
        for i, item in enumerate(items):
            if transform:
                item = transform(item)
            text = text.replace(f"<{tag}_{chr(ord('a') + i)}>", item)
        return text

    def correct_pinyin(self, pinyin: str) -> str:
        """jqx + u/ü -> v (reference `front.py:146-157`)."""
        if pinyin[0] not in "jqxJQX":
            return pinyin
        pinyin = re.sub(r"([jqx])[uü](n|e|an)*(\d)", r"\g<1>v\g<2>\g<3>",
                        pinyin, flags=re.IGNORECASE)
        return pinyin.upper()

    def normalize(self, text: str) -> str:
        text = re.sub(ENGLISH_CONTRACTION_PATTERN, r"\1 is", text,
                      flags=re.IGNORECASE)
        if self.use_chinese(text):
            text, pinyins = self._save(text.rstrip(), PINYIN_TONE_PATTERN, "pinyin")
            text, names = self._save(text, NAME_PATTERN, "n")
            result = _zh_verbalize(text)
            result = self._restore(result, names, "n")
            result = self._restore(result, pinyins, "pinyin", self.correct_pinyin)
            rep = ZH_CHAR_REP_MAP
        else:
            result = _en_verbalize(text)
            rep = CHAR_REP_MAP
        pattern = re.compile("|".join(re.escape(p) for p in rep))
        return pattern.sub(lambda m: rep[m.group()], result)
