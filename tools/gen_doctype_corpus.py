"""Generate tests/corpus/tokenizer/zhtml_ray5_doctype.test — DOCTYPE
state-family cases (16 tokenizer states), expected outputs hand-derived
from the WHATWG spec sections 13.2.5.53-13.2.5.68. DOCTYPE output shape:
[name, public_id, system_id, correctness] with correctness = NOT
force-quirks (the reference harness convention,
/root/reference/test/tokenizer-html5lib.zig:189-191)."""

import json
import os

CASES = []


def c(desc, inp, out, errors=()):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    CASES.append(t)


D = "DOCTYPE"

# ---------------------------------------------------------- happy paths
c("doctype lowercase kw", "<!doctype html>", [[D, "html", None, None, True]])
c("doctype mixed case name", "<!DOCTYPE HtMl>", [[D, "html", None, None, True]])
c("doctype public system dq", '<!DOCTYPE html PUBLIC "p" "s">',
  [[D, "html", "p", "s", True]])
c("doctype public system sq", "<!DOCTYPE html PUBLIC 'p' 's'>",
  [[D, "html", "p", "s", True]])
c("doctype system only", '<!DOCTYPE html SYSTEM "s">',
  [[D, "html", None, "s", True]])
c("doctype public only", '<!DOCTYPE html PUBLIC "p">',
  [[D, "html", "p", None, True]])
c("doctype extra ws everywhere", "<!DOCTYPE\thtml\f>",
  [[D, "html", None, None, True]])
c("doctype case insensitive kws", "<!DOCTYPE html public 'p' system-ish>",
  # 'system-ish' after public id without quote → bogus; see below
  None)  # placeholder removed just after
CASES.pop()

# ------------------------------------------------- whitespace / quotes
c("missing ws after public kw", '<!DOCTYPE html PUBLIC"p">',
  [[D, "html", "p", None, True]],
  ["missing-whitespace-after-doctype-public-keyword"])
c("missing ws after system kw", '<!DOCTYPE html SYSTEM"s">',
  [[D, "html", None, "s", True]],
  ["missing-whitespace-after-doctype-system-keyword"])
c("missing ws between ids", '<!DOCTYPE html PUBLIC "p""s">',
  [[D, "html", "p", "s", True]],
  ["missing-whitespace-between-doctype-public-and-system-identifiers"])
c("missing quote before public", "<!DOCTYPE html PUBLIC p>",
  [[D, "html", None, None, False]],
  ["missing-quote-before-doctype-public-identifier"])
c("missing quote before system", "<!DOCTYPE html SYSTEM s>",
  [[D, "html", None, None, False]],
  ["missing-quote-before-doctype-system-identifier"])
c("missing quote system after public", '<!DOCTYPE html PUBLIC "p" s>',
  [[D, "html", "p", None, False]],
  ["missing-quote-before-doctype-system-identifier"])

# ------------------------------------------------------ abrupt / eof
c("abrupt public id", '<!DOCTYPE html PUBLIC "p>x',
  [[D, "html", "p", None, False], ["Character", "x"]],
  ["abrupt-doctype-public-identifier"])
c("abrupt system id", '<!DOCTYPE html SYSTEM "s>x',
  [[D, "html", None, "s", False], ["Character", "x"]],
  ["abrupt-doctype-system-identifier"])
c("eof in doctype name", "<!DOCTYPE ht",
  [[D, "ht", None, None, False]], ["eof-in-doctype"])
c("eof before name", "<!DOCTYPE ",
  [[D, None, None, None, False]], ["eof-in-doctype"])
c("eof after doctype kw", "<!DOCTYPE",
  [[D, None, None, None, False]], ["eof-in-doctype"])
c("eof in public id", '<!DOCTYPE html PUBLIC "p',
  [[D, "html", "p", None, False]], ["eof-in-doctype"])
c("eof in system id", '<!DOCTYPE html SYSTEM "s',
  [[D, "html", None, "s", False]], ["eof-in-doctype"])
c("eof after public kw", "<!DOCTYPE html PUBLIC",
  [[D, "html", None, None, False]], ["eof-in-doctype"])

# ------------------------------------------------------- bogus / trailing
c("invalid sequence after name", "<!DOCTYPE html FOO>",
  [[D, "html", None, None, False]],
  ["invalid-character-sequence-after-doctype-name"])
c("junk after system id ignored", '<!DOCTYPE html SYSTEM "s" junk>',
  [[D, "html", None, "s", True]],
  ["unexpected-character-after-doctype-system-identifier"])
c("junk after public+system ignored", '<!DOCTYPE html PUBLIC "p" "s" x>',
  [[D, "html", "p", "s", True]],
  ["unexpected-character-after-doctype-system-identifier"])
c("missing doctype name gt", "<!DOCTYPE >",
  [[D, None, None, None, False]], ["missing-doctype-name"])
c("null in doctype name", "<!DOCTYPE ht\x00ml>",
  [[D, "ht�ml", None, None, True]], ["unexpected-null-character"])
c("null in public id", '<!DOCTYPE html PUBLIC "p\x00q">',
  [[D, "html", "p�q", None, True]], ["unexpected-null-character"])
c("gt in public kw position", "<!DOCTYPE html PUBLIC>",
  [[D, "html", None, None, False]],
  ["missing-doctype-public-identifier"])
c("gt in system kw position", "<!DOCTYPE html SYSTEM>",
  [[D, "html", None, None, False]],
  ["missing-doctype-system-identifier"])
c("gt after public id", '<!DOCTYPE html PUBLIC "p">',
  [[D, "html", "p", None, True]])
c("between ids then gt", '<!DOCTYPE html PUBLIC "p" >',
  [[D, "html", "p", None, True]])


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray5_doctype.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(CASES)} cases to {out}")


if __name__ == "__main__":
    main()
