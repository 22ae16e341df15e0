// Text-normalization core: number verbalization (zh + en).
//
// Native counterpart of the rule engine in voice_tts_tpu/text/normalizer.py —
// the role the compiled OpenFst tagger/verbalizer grammars play in the
// reference (`utils/tagger_cache/*.fst`, consumed via WeTextProcessing at
// `front.py:100-111`).  Exposed through a C ABI for ctypes.
//
// Build: g++ -O2 -shared -fPIC -o libtn_core.so tn_core.cpp

#include <cstdint>
#include <cstring>
#include <string>

namespace {

const char* kZhDigits[10] = {"零", "一", "二", "三", "四",
                             "五", "六", "七", "八", "九"};
const char* kZhUnits[4] = {"", "十", "百", "千"};
const char* kZhGroups[4] = {"", "万", "亿", "万亿"};

std::string zh_integer(long long num) {
    if (num == 0) return kZhDigits[0];
    std::string out;
    if (num < 0) {
        out += "负";
        num = -num;
    }
    int groups[5];
    int n_groups = 0;
    long long v = num;
    while (v > 0) {
        groups[n_groups++] = static_cast<int>(v % 10000);
        v /= 10000;
    }
    std::string body;
    for (int gi = n_groups - 1; gi >= 0; --gi) {
        int g = groups[gi];
        if (g == 0) continue;
        std::string text;
        bool zero_pending = false;
        const int divisors[4] = {1000, 100, 10, 1};
        for (int pos = 0; pos < 4; ++pos) {
            int unit_pos = 3 - pos;
            int d = (g / divisors[pos]) % 10;
            if (d == 0) {
                if (!text.empty()) zero_pending = true;
                continue;
            }
            if (zero_pending) {
                text += kZhDigits[0];
                zero_pending = false;
            }
            // leading 一十 -> 十 (only for the most significant group < 20)
            bool drop_yi = (unit_pos == 1 && d == 1 && text.empty()
                            && gi == n_groups - 1 && g < 20);
            if (!drop_yi) text += kZhDigits[d];
            text += kZhUnits[unit_pos];
        }
        // linking 零 between groups: needed when the group has leading
        // zeros (10,000,200 -> 一千万零二百) OR an entire higher group was
        // skipped (100,000,001 -> 一亿零一)
        if (!body.empty() && (g < 1000 || groups[gi + 1] == 0)) {
            text = std::string(kZhDigits[0]) + text;
        }
        body += text + kZhGroups[gi];
    }
    out += body;
    return out;
}

std::string zh_digits(const char* s) {
    std::string out;
    for (const char* p = s; *p; ++p) {
        if (*p >= '0' && *p <= '9') out += kZhDigits[*p - '0'];
    }
    return out;
}

const char* kEnOnes[20] = {
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen"};
const char* kEnTens[10] = {"", "", "twenty", "thirty", "forty", "fifty",
                           "sixty", "seventy", "eighty", "ninety"};

std::string en_integer(long long num) {
    if (num < 0) return "minus " + en_integer(-num);
    if (num < 20) return kEnOnes[num];
    if (num < 100) {
        long long tens = num / 10, ones = num % 10;
        std::string out = kEnTens[tens];
        if (ones) out += std::string("-") + kEnOnes[ones];
        return out;
    }
    struct Scale { long long value; const char* name; };
    const Scale scales[] = {{1000000000LL, "billion"}, {1000000LL, "million"},
                            {1000LL, "thousand"}, {100LL, "hundred"}};
    for (const auto& s : scales) {
        if (num >= s.value) {
            std::string out = en_integer(num / s.value) + " " + s.name;
            long long rest = num % s.value;
            if (rest) out += " " + en_integer(rest);
            return out;
        }
    }
    return std::to_string(num);
}

int copy_out(const std::string& s, char* out, int cap) {
    if (static_cast<int>(s.size()) + 1 > cap) return -1;
    std::memcpy(out, s.c_str(), s.size() + 1);
    return static_cast<int>(s.size());
}

}  // namespace

extern "C" {

int tn_zh_integer(long long value, char* out, int cap) {
    return copy_out(zh_integer(value), out, cap);
}

int tn_zh_digits(const char* digits, char* out, int cap) {
    return copy_out(zh_digits(digits), out, cap);
}

int tn_en_integer(long long value, char* out, int cap) {
    return copy_out(en_integer(value), out, cap);
}

}  // extern "C"
