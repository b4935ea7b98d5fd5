"""Generate tests/corpus/tokenizer/zhtml_ray4_script.test — script-data
escaped / double-escaped state cases plus RCDATA/RAWTEXT end-tag edges
(the hardest area of the 80-state machine; expected outputs hand-derived
from the WHATWG script-data state definitions, adjudicated against the
implementation on mismatch — spec wins)."""

import json
import os

CASES = []


def c(desc, inp, out, errors=(), state="Script data state", last="script"):
    t = {"description": desc, "input": inp, "output": out,
         "initialStates": [state], "lastStartTag": last}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    CASES.append(t)


EOF_CMT = "eof-in-script-html-comment-like-text"

# --------------------------------------------------- escaped state flow
c("escaped comment passthrough", "a<!--b-->c", [["Character", "a<!--b-->c"]])
c("escaped dashdash bang stays", "a<!--b--!>c",
  [["Character", "a<!--b--!>c"]], [EOF_CMT])
c("escape start incomplete", "<!-x", [["Character", "<!-x"]])
c("escape start dashdash gt", "<!-->x", [["Character", "<!-->x"]])
c("single dashes verbatim", "a-b<!--c-d-->e", [["Character", "a-b<!--c-d-->e"]])
c("eof in escaped", "x<!--", [["Character", "x<!--"]], [EOF_CMT])
c("end tag inside escaped", "a<!--b</script>c",
  [["Character", "a<!--b"], ["EndTag", "script"], ["Character", "c"]])
c("non-script open inside escaped", "<!--<scripty>x</script>",
  [["Character", "<!--<scripty>x"], ["EndTag", "script"]])
c("null in escaped", "<!--\x00-->",
  [["Character", "<!--\ufffd-->"]],
  ["unexpected-null-character"])

# ------------------------------------------------- double escaped state
c("double escape full", "<!--<script>alert(1)</script>-->x",
  [["Character", "<!--<script>alert(1)</script>-->x"]])
c("double escape dashdash gt leaves", "<!--<script>--></script>x",
  [["Character", "<!--<script>-->"], ["EndTag", "script"],
   ["Character", "x"]])
c("double escape case insensitive", "<!--<SCRIPT>x</SCRIPT>-->y",
  [["Character", "<!--<SCRIPT>x</SCRIPT>-->y"]])
c("double escape attr form", "<!--<script x>y</script>-->",
  [["Character", "<!--<script x>y</script>-->"]])
c("eof in double escaped", "<!--<script>x",
  [["Character", "<!--<script>x"]], [EOF_CMT])
c("double escape end then close", "<!--<script></script>--></script>z",
  [["Character", "<!--<script></script>-->"], ["EndTag", "script"],
   ["Character", "z"]])

# --------------------------------------------- RCDATA / RAWTEXT end tags
c("rcdata end tag with attribute", "x</title y=1>z",
  [["Character", "x"], ["EndTag", "title"], ["Character", "z"]],
  ["end-tag-with-attributes"], state="RCDATA state", last="title")
c("rcdata wrong end tag name", "x</titlex>y",
  [["Character", "x</titlex>y"]], state="RCDATA state", last="title")
c("rawtext partial end at eof", "x</sty",
  [["Character", "x</sty"]], state="RAWTEXT state", last="style")
c("rcdata self closing end tag", "x</title/>y",
  [["Character", "x"], ["EndTag", "title"], ["Character", "y"]],
  ["end-tag-with-trailing-solidus"], state="RCDATA state", last="title")
c("rawtext end then data tag", "a</style><b>c",
  [["Character", "a"], ["EndTag", "style"], ["StartTag", "b", {}],
   ["Character", "c"]], state="RAWTEXT state", last="style")


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray4_script.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(CASES)} cases to {out}")


if __name__ == "__main__":
    main()
