#!/usr/bin/env python3
"""Differential fixture generator for TextRefs: runs the engine's
issue-ref extraction semantics in CPython's `re` (the reference
implementation language) over a seeded corpus of synthetic texts, and
pins the results to JSON. TextRefsDifferentialSpec replays the corpus
through the Scala implementation and compares — catching any
Python-vs-Java regex divergence (lookbehind splits, word boundaries,
case folding).
"""
import json
import random
import re

ISSUE_REF = re.compile(
    r"(?:(?P<kw>close[sd]?|fixe?[sd]?|resolve[sd]?)\s*[:\-–—]*\s+)?"
    r"(?:(?P<full>[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+)#(?P<num1>\d+)|#(?P<num2>\d+))",
    re.IGNORECASE)
CLOSING_KW = re.compile(r"\b(close[sd]?|fixe?[sd]?|resolve[sd]?)\b", re.IGNORECASE)
SENT_SPLIT = re.compile(r"(?<=[.!?\n])\s+")


def extract(text):
    out = []
    for sent in SENT_SPLIT.split(text):
        if not sent:
            continue
        sent_kw = CLOSING_KW.search(sent) is not None
        for m in ISSUE_REF.finditer(sent):
            num = m.group("num1") or m.group("num2")
            if num is None:
                continue
            out.append({
                "full_repo": m.group("full"),
                "number": int(num),
                "has_closing_kw": m.group("kw") is not None or sent_kw,
            })
    return out


def main():
    rnd = random.Random(42)
    kws = ["fixes", "Fixes", "closed", "resolve", "FIXED", "close",
           "respects", "prefixes", ""]
    repos = ["", "owner/repo", "a.b/c-d", "x_1/y.2"]
    seps = [" ", ". ", "! ", "? ", "\n", "\n ", ", ", ": ", " - ", "\t"]
    fillers = ["see", "also", "this", "unfixed", "refactor", "PR", "", "résumé"]
    # Handcrafted non-ASCII-adjacent cases: Unicode word chars against
    # \b (closesé), NBSP / U+2028 against \s, Unicode decimal digits
    # against \d + int() — the places Java's default ASCII classes
    # diverge from Python re (pinned via UNICODE_CHARACTER_CLASS on
    # the Scala side).
    unicode_texts = [
        "closes\u00e9 #5",                  # \u00e9 is a word char: no \\b
        "closes\u00a0#6 done.",             # NBSP as kw/ref separator
        "done.\u2028fixes #7",              # U+2028 after sentence dot
        "r\u00e9sum\u00e9 closes #8. unrelated #9",
        "closes\u00a0:\u00a0#10",
        "pr\u00e9fixes #11",                # embedded 'fixes' kw group
        "fixes #\u0661\u0662",             # Arabic-Indic digits, int()=12
        "na\u00efve fix. resolves #13 too",
        "closes#14 no space",
        "Fix\u00e9 #15. closes #16",
        "closes\u3000#17",                  # U+3000 ideographic space
        "closes\u2009#18. end",             # thin space
    ]
    cases = [{"text": t, "refs": extract(t)} for t in unicode_texts]
    for i in range(400):
        parts = []
        for _ in range(rnd.randint(1, 5)):
            kind = rnd.randint(0, 3)
            if kind == 0:
                repo = rnd.choice(repos)
                ref = (repo + "#" + str(rnd.randint(1, 999))) if repo \
                    else "#" + str(rnd.randint(1, 999))
                parts.append((rnd.choice(kws) + " " + ref).strip())
            elif kind == 1:
                parts.append(rnd.choice(fillers))
            elif kind == 2:
                parts.append(rnd.choice(kws))
            else:
                parts.append("#" + str(rnd.randint(1, 99)))
        text = ""
        for j, p in enumerate(parts):
            text += p
            if j < len(parts) - 1:
                text += rnd.choice(seps)
        cases.append({"text": text, "refs": extract(text)})
    with open("src/test/resources/textrefs_fixture.json", "w") as f:
        json.dump(cases, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(cases)} cases,",
          sum(len(c['refs']) for c in cases), "refs")


if __name__ == "__main__":
    main()
