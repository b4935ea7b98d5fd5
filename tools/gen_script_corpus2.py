"""Generate tests/corpus/tokenizer/zhtml_ray9_script2.test — deeper
script-data escape-state transitions (spec 13.2.5.18-.29): the
dash-dash '>' exits from BOTH escape levels, double-escape entry/exit
via solidus and whitespace, '--!>' and '-- ' non-exits, nested '<!'
as text, and dash states without a preceding '<!--'. Expected outputs
are HAND-DERIVED from the spec state machines (not baked from the
engine), so a failure is a real divergence to adjudicate.
"""

import json
import os

T = []


def c(desc, inp, out, errors=None, **kw):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    t.update(kw)
    T.append(t)


CH = "Character"
SD = {"initialStates": ["Script data state"], "lastStartTag": "script"}
EOFERR = "eof-in-script-html-comment-like-text"

c("dash run inside escaped then close", "<!--x--x-->y",
  [[CH, "<!--x--x-->y"]], **SD)
c("dash dash space stays escaped (no close)", "<!--x-- >y",
  [[CH, "<!--x-- >y"]], [EOFERR], **SD)
c("double escaped with inner dashes closes",
  "<!--<script>a-b</script>-->c",
  [[CH, "<!--<script>a-b</script>-->c"]], **SD)
c("dash dash gt exits double escape straight to script data",
  "<!--<script>a--></script>x",
  [[CH, "<!--<script>a-->"], ["EndTag", "script"], [CH, "x"]], **SD)
c("non-matching double escape end stays double escaped",
  "<!--<script></scr>-->x",
  [[CH, "<!--<script></scr>-->x"]], **SD)
c("appropriate end tag inside escaped emits tag", "<!--</script>x",
  [[CH, "<!--"], ["EndTag", "script"], [CH, "x"]], **SD)
c("double escape entry and exit via whitespace",
  "<!--<script >x</script >-->y",
  [[CH, "<!--<script >x</script >-->y"]], **SD)
c("double escape entry via solidus", "<!--<script/>x</script>-->y",
  [[CH, "<!--<script/>x</script>-->y"]], **SD)
c("eof in escaped after double escape exit",
  "<!--<script>--x</script>",
  [[CH, "<!--<script>--x</script>"]], [EOFERR], **SD)
c("nested markup declaration is text in escaped", "<!--<!--x-->y",
  [[CH, "<!--<!--x-->y"]], **SD)
c("dashes without escape start are plain script data", "x--y-->z",
  [[CH, "x--y-->z"]], **SD)
c("second arrow is plain after close", "<!--x-->-->y",
  [[CH, "<!--x-->-->y"]], **SD)
c("minimal escape start closes immediately", "<!---->x",
  [[CH, "<!---->x"]], **SD)
c("bang breaks dash dash after double escape exit",
  "<!--<script>x</script>--!>y",
  [[CH, "<!--<script>x</script>--!>y"]], [EOFERR], **SD)
c("lt non-letter is text in double escaped",
  "<!--<script>a<b</script>c-->d",
  [[CH, "<!--<script>a<b</script>c-->d"]], **SD)
c("dash dash space stays double escaped",
  "<!--<script>x-- >y",
  [[CH, "<!--<script>x-- >y"]], [EOFERR], **SD)
c("non-matching script end tag is text", "</scrip>x",
  [[CH, "</scrip>x"]], **SD)
c("lt letter is plain text in script data", "a<script>b",
  [[CH, "a<script>b"]], **SD)


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray9_script2.test")
    with open(out, "w") as f:
        json.dump({"tests": T}, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(T)} cases to {out}")


if __name__ == "__main__":
    main()
