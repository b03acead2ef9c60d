"""Double Metaphone phonetic encoding (Lawrence Philips, C/C++ Users
Journal, June 2000 — public-domain algorithm).

The reference exposes double-metaphone through its bundled Scala UDF
jar (reference: splink/files/spark_jars/scala-udf-similarity-*.jar,
classes ``DoubleMetaphone`` / ``DoubleMetaphoneAlt``, surfaced via
splink/comparison_level_library.py::distance_function_level). We have
no JVM jar; this is a pure-Python transcription of the published
algorithm, exposed as a batch pandas UDF.

Performance note: phonetic encoding is an inherently sequential
per-string state machine — there is nothing to vectorize across the
batch (unlike the Jaro/OSA kernels). The per-string cost is O(len)
with tiny constants; the Arrow batch boundary amortizes the
Python-call overhead exactly like the reference's per-row Scala UDF
amortizes JVM dispatch. Use ``phonetic_match_level`` only on
name-like short-string columns, as splink users do.
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(word: str, i: int) -> bool:
    return 0 <= i < len(word) and word[i] in VOWELS


def _slavo_germanic(word: str) -> bool:
    return (
        "W" in word or "K" in word or "CZ" in word or "WITZ" in word
    )


def _at(word: str, i: int, n: int = 1) -> str:
    """Substring [i, i+n) with out-of-range padding ('' semantics)."""
    if i < 0:
        return ""
    return word[i : i + n]


def _any_at(word: str, i: int, n: int, *options: str) -> bool:
    return _at(word, i, n) in options


def double_metaphone(value: str | None, max_length: int = 4):
    """Return (primary, secondary) codes; equal-None input -> ("", "")."""
    if not value:
        return ("", "")
    # keep ascii letters + spaces, uppercase (the published algorithm
    # is defined over A-Z with significant word spaces, e.g. "SAN ",
    # "VAN "; accented input should be transliterated first via
    # functions.text.strip_diacritics)
    stripped = "".join(
        ch for ch in value.upper() if ("A" <= ch <= "Z") or ch == " "
    ).strip()
    if not stripped:
        return ("", "")

    length = len(stripped)
    last = length - 1
    sg = _slavo_germanic(stripped)
    # canonical implementation pads with 5 trailing spaces so
    # lookaheads like "IER " / word[i+4]==' ' work at end-of-word
    word = stripped + "     "

    pri: list[str] = []
    sec: list[str] = []
    # running EMITTED-CHARACTER lengths: branches may add '' to one code
    # or multi-char fragments ('KS', 'TS'), so len(pri)/len(sec) (entry
    # counts) would terminate the scan early or late vs the published
    # algorithm's character-count cutoff
    pri_len = 0
    sec_len = 0

    def add(p: str, s: str | None = None) -> None:
        nonlocal pri_len, sec_len
        pri.append(p)
        sec.append(p if s is None else s)
        pri_len += len(p)
        sec_len += len(p if s is None else s)

    i = 0
    # silent first letters
    if _any_at(word, 0, 2, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X is pronounced Z -> S (e.g. Xavier)
    if _at(word, 0) == "X":
        add("S")
        i = 1

    while i < length and (
        pri_len < max_length or sec_len < max_length
    ):
        c = word[i]

        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue

        if c == "B":
            add("P")
            i += 2 if _at(word, i + 1) == "B" else 1
            continue

        if c == "C":
            # various germanic
            if (
                i > 1
                and not _is_vowel(word, i - 2)
                and _at(word, i - 1, 3) == "ACH"
                and _at(word, i + 2) != "I"
                and (
                    _at(word, i + 2) != "E"
                    or _at(word, i - 2, 6) in ("BACHER", "MACHER")
                )
            ):
                add("K")
                i += 2
                continue
            # special case 'caesar'
            if i == 0 and _at(word, i, 6) == "CAESAR":
                add("S")
                i += 2
                continue
            # italian 'chianti'
            if _at(word, i, 4) == "CHIA":
                add("K")
                i += 2
                continue
            if _at(word, i, 2) == "CH":
                # 'michael'
                if i > 0 and _at(word, i, 4) == "CHAE":
                    add("K", "X")
                    i += 2
                    continue
                # greek roots: chemistry, chorus, ...
                if (
                    i == 0
                    and (
                        _any_at(word, i + 1, 5, "HARAC", "HARIS")
                        or _any_at(word, i + 1, 3, "HOR", "HYM", "HIA", "HEM")
                    )
                    and _at(word, 0, 5) != "CHORE"
                ):
                    add("K")
                    i += 2
                    continue
                # germanic, greek, or otherwise 'ch' as 'k'
                if (
                    _any_at(word, 0, 4, "VAN ", "VON ")
                    or _at(word, 0, 3) == "SCH"
                    or _any_at(word, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or _any_at(word, i + 2, 1, "T", "S")
                    or (
                        (
                            i == 0
                            or _any_at(word, i - 1, 1, "A", "O", "U", "E")
                        )
                        and _any_at(
                            word, i + 2, 1,
                            "L", "R", "N", "M", "B", "H", "F", "V", "W",
                        )
                    )
                    or i + 2 > last
                    and (i == 0 or _any_at(word, i - 1, 1, "A", "O", "U", "E"))
                ):
                    add("K")
                else:
                    if i > 0:
                        if _at(word, 0, 2) == "MC":
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            # 'czerny'
            if _at(word, i, 2) == "CZ" and _at(word, i - 2, 4) != "WICZ":
                add("S", "X")
                i += 2
                continue
            # 'focaccia'
            if _at(word, i + 1, 3) == "CIA":
                add("X")
                i += 3
                continue
            # double 'C', but not 'McClellan'
            if _at(word, i, 2) == "CC" and not (
                i == 1 and _at(word, 0) == "M"
            ):
                # 'bellocchio' but not 'bacchus'
                if (
                    _any_at(word, i + 2, 1, "I", "E", "H")
                    and _at(word, i + 2, 2) != "HU"
                ):
                    # 'accident', 'accede', 'succeed'
                    if (
                        i == 1 and _at(word, i - 1) == "A"
                    ) or _any_at(word, i - 1, 5, "UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                    continue
                else:
                    add("K")
                    i += 2
                    continue
            if _any_at(word, i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if _any_at(word, i, 2, "CI", "CE", "CY"):
                # italian vs english
                if _any_at(word, i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if _any_at(word, i + 1, 2, " C", " Q", " G"):
                i += 3
            elif (
                _any_at(word, i + 1, 1, "C", "K", "Q")
                and not _any_at(word, i + 1, 2, "CE", "CI")
            ):
                i += 2
            else:
                i += 1
            continue

        if c == "D":
            if _at(word, i, 2) == "DG":
                if _any_at(word, i + 2, 1, "I", "E", "Y"):
                    # 'edge'
                    add("J")
                    i += 3
                    continue
                else:
                    # 'edgar'
                    add("TK")
                    i += 2
                    continue
            if _any_at(word, i, 2, "DT", "DD"):
                add("T")
                i += 2
                continue
            add("T")
            i += 1
            continue

        if c == "F":
            add("F")
            i += 2 if _at(word, i + 1) == "F" else 1
            continue

        if c == "G":
            if _at(word, i + 1) == "H":
                if i > 0 and not _is_vowel(word, i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    # 'ghislane', 'ghiradelli'
                    if _at(word, i + 2) == "I":
                        add("J")
                    else:
                        add("K")
                    i += 2
                    continue
                # Parker's rule (with some further refinements) - e.g. 'hugh'
                if (
                    _any_at(word, i - 2, 1, "B", "H", "D")
                    or _any_at(word, i - 3, 1, "B", "H", "D")
                    or _any_at(word, i - 4, 1, "B", "H")
                ):
                    i += 2
                    continue
                # e.g. 'laugh', 'McLaughlin', 'cough', 'gough', 'rough', 'tough'
                if (
                    i > 2
                    and _at(word, i - 1) == "U"
                    and _any_at(word, i - 3, 1, "C", "G", "L", "R", "T")
                ):
                    add("F")
                elif i > 0 and _at(word, i - 1) != "I":
                    add("K")
                i += 2
                continue
            if _at(word, i + 1) == "N":
                if i == 1 and _is_vowel(word, 0) and not sg:
                    add("KN", "N")
                elif (
                    _at(word, i + 2, 2) != "EY"
                    and _at(word, i + 1) != "Y"
                    and not sg
                ):
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            # 'tagliaro'
            if _at(word, i + 1, 2) == "LI" and not sg:
                add("KL", "L")
                i += 2
                continue
            # -ges-, -gep-, -gel-, -gie- at beginning
            if i == 0 and (
                _at(word, i + 1) == "Y"
                or _any_at(
                    word, i + 1, 2,
                    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN",
                    "IE", "EI", "ER",
                )
            ):
                add("K", "J")
                i += 2
                continue
            # -ger-, -gy-
            if (
                (_at(word, i + 1, 2) == "ER" or _at(word, i + 1) == "Y")
                and not _any_at(word, 0, 6, "DANGER", "RANGER", "MANGER")
                and not _any_at(word, i - 1, 1, "E", "I")
                and not _any_at(word, i - 1, 3, "RGY", "OGY")
            ):
                add("K", "J")
                i += 2
                continue
            # italian 'biaggi'
            if _any_at(word, i + 1, 1, "E", "I", "Y") or _any_at(
                word, i - 1, 4, "AGGI", "OGGI"
            ):
                # germanic
                if (
                    _any_at(word, 0, 4, "VAN ", "VON ")
                    or _at(word, 0, 3) == "SCH"
                    or _at(word, i + 1, 2) == "ET"
                ):
                    add("K")
                elif _at(word, i + 1, 4) == "IER ":
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if _at(word, i + 1) == "G" else 1
            continue

        if c == "H":
            # keep H if first & before vowel or between 2 vowels
            if (i == 0 or _is_vowel(word, i - 1)) and _is_vowel(
                word, i + 1
            ):
                add("H")
                i += 2
            else:
                i += 1
            continue

        if c == "J":
            # obvious spanish: 'jose', 'san jacinto'
            if _at(word, i, 4) == "JOSE" or _at(word, 0, 4) == "SAN ":
                if (
                    i == 0 and _at(word, i + 4) == " "
                ) or _at(word, 0, 4) == "SAN ":
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and _at(word, i, 4) != "JOSE":
                add("J", "A")  # Yankelovich/Jankelowicz
            elif (
                _is_vowel(word, i - 1)
                and not sg
                and (_at(word, i + 1) == "A" or _at(word, i + 1) == "O")
            ):
                # spanish pron. of e.g. 'bajador'
                add("J", "H")
            elif i == last:
                add("J", "")
            elif not _any_at(
                word, i + 1, 1,
                "L", "T", "K", "S", "N", "M", "B", "Z",
            ) and not _any_at(word, i - 1, 1, "S", "K", "L"):
                add("J")
            i += 2 if _at(word, i + 1) == "J" else 1
            continue

        if c == "K":
            add("K")
            i += 2 if _at(word, i + 1) == "K" else 1
            continue

        if c == "L":
            if _at(word, i + 1) == "L":
                # spanish 'cabrillo', 'gallegos'
                if (
                    i == length - 3
                    and _any_at(word, i - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (
                        _any_at(word, last - 1, 2, "AS", "OS")
                        or _any_at(word, last, 1, "A", "O")
                    )
                    and _at(word, i - 1, 4) == "ALLE"
                ):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue

        if c == "M":
            add("M")
            if (
                _at(word, i - 1, 3) == "UMB"
                and (i + 1 == last or _at(word, i + 2, 2) == "ER")
            ) or _at(word, i + 1) == "M":
                i += 2
            else:
                i += 1
            continue

        if c == "N":
            add("N")
            i += 2 if _at(word, i + 1) == "N" else 1
            continue

        if c == "P":
            if _at(word, i + 1) == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if _any_at(word, i + 1, 1, "P", "B") else 1
            continue

        if c == "Q":
            add("K")
            i += 2 if _at(word, i + 1) == "Q" else 1
            continue

        if c == "R":
            # french e.g. 'rogier', exclude 'hochmeier'
            if (
                i == last
                and not sg
                and _at(word, i - 2, 2) == "IE"
                and not _any_at(word, i - 4, 2, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if _at(word, i + 1) == "R" else 1
            continue

        if c == "S":
            # special cases 'island', 'isle', 'carlisle', 'carlysle'
            if _any_at(word, i - 1, 3, "ISL", "YSL"):
                i += 1
                continue
            # 'sugar'
            if i == 0 and _at(word, i, 5) == "SUGAR":
                add("X", "S")
                i += 1
                continue
            if _at(word, i, 2) == "SH":
                # germanic
                if _any_at(
                    word, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"
                ):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            # italian & armenian
            if _any_at(word, i, 3, "SIO", "SIA") or _at(word, i, 4) == "SIAN":
                if not sg:
                    add("S", "X")
                else:
                    add("S")
                i += 3
                continue
            # german & anglicisations e.g. 'smith' match 'schmidt',
            # 'snider' match 'schneider'
            if (
                i == 0
                and _any_at(word, i + 1, 1, "M", "N", "L", "W")
            ) or _at(word, i + 1) == "Z":
                add("S", "X")
                i += 2 if _at(word, i + 1) == "Z" else 1
                continue
            if _at(word, i, 2) == "SC":
                # Schlesinger's rule
                if _at(word, i + 2) == "H":
                    # dutch origin e.g. 'school', 'schooner'
                    if _any_at(
                        word, i + 3, 2,
                        "OO", "ER", "EN", "UY", "ED", "EM",
                    ):
                        # 'schermerhorn', 'schenker'
                        if _any_at(word, i + 3, 2, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                        i += 3
                        continue
                    else:
                        if (
                            i == 0
                            and not _is_vowel(word, 3)
                            and _at(word, 3) != "W"
                        ):
                            add("X", "S")
                        else:
                            add("X")
                        i += 3
                        continue
                if _any_at(word, i + 2, 1, "I", "E", "Y"):
                    add("S")
                    i += 3
                    continue
                add("SK")
                i += 3
                continue
            # french e.g. 'resnais', 'artois'
            if i == last and _any_at(word, i - 2, 2, "AI", "OI"):
                add("", "S")
            else:
                add("S")
            i += 2 if _any_at(word, i + 1, 1, "S", "Z") else 1
            continue

        if c == "T":
            if _at(word, i, 4) == "TION":
                add("X")
                i += 3
                continue
            if _any_at(word, i, 3, "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if _at(word, i, 2) == "TH" or _at(word, i, 3) == "TTH":
                # special case 'thomas', 'thames' or germanic
                if (
                    _any_at(word, i + 2, 2, "OM", "AM")
                    or _any_at(word, 0, 4, "VAN ", "VON ")
                    or _at(word, 0, 3) == "SCH"
                ):
                    add("T")
                else:
                    add("0", "T")  # '0' = 'th' sound
                i += 2
                continue
            add("T")
            i += 2 if _any_at(word, i + 1, 1, "T", "D") else 1
            continue

        if c == "V":
            add("F")
            i += 2 if _at(word, i + 1) == "V" else 1
            continue

        if c == "W":
            # can also be in middle of word
            if _at(word, i, 2) == "WR":
                add("R")
                i += 2
                continue
            if i == 0 and (
                _is_vowel(word, i + 1) or _at(word, i, 2) == "WH"
            ):
                # Wasserman should match Vasserman
                if _is_vowel(word, i + 1):
                    add("A", "F")
                else:
                    add("A")
                i += 1
                continue
            # Arnow should match Arnoff
            if (
                (i == last and _is_vowel(word, i - 1))
                or _any_at(word, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or _at(word, 0, 3) == "SCH"
            ):
                add("", "F")
                i += 1
                continue
            # polish e.g. 'filipowicz'
            if _any_at(word, i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue

        if c == "X":
            # french e.g. 'breaux'
            if not (
                i == last
                and (
                    _any_at(word, i - 3, 3, "IAU", "EAU")
                    or _any_at(word, i - 2, 2, "AU", "OU")
                )
            ):
                add("KS")
            i += 2 if _any_at(word, i + 1, 1, "C", "X") else 1
            continue

        if c == "Z":
            # chinese pinyin e.g. 'zhao'
            if _at(word, i + 1) == "H":
                add("J")
                i += 2
                continue
            if _any_at(word, i + 1, 2, "ZO", "ZI", "ZA") or (
                sg and i > 0 and _at(word, i - 1) != "T"
            ):
                add("S", "TS")
            else:
                add("S")
            i += 2 if _at(word, i + 1) == "Z" else 1
            continue

        # anything else: skip
        i += 1

    p = "".join(pri)[:max_length]
    s = "".join(sec)[:max_length]
    return (p, s)


def double_metaphone_batch(values) -> "list[tuple[str, str]]":
    return [double_metaphone(v) for v in values]
