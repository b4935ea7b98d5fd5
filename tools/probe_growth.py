"""N-vs-2N growth probe over the hostile-shape matrix.

Usage: python tools/probe_growth.py [N]

Flags any shape whose wall more than triples when the input doubles
(while exceeding 0.3 s absolute). Every shape here was found quadratic
at some point in round 3 and fixed (see BENCH/BASELINE.md
"Adversarial-depth robustness"); rerun after kernel changes to catch
regressions beyond the fixed-size alarm tests.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.extract import extract_document  # noqa: E402

SHAPES = {
    "deep_nest":      lambda n: "<div>" * n + "x",
    "deep_planted_p": lambda n: "<p>" + "<div>" * n + "x",
    "end_tag_spam":   lambda n: "<span>" * n + "</b>" * n,
    "table_reset":    lambda n: "<div>" * n + "<table></table>" * (n // 6),
    "form_spam":      lambda n: "<div>" * n + "<form></form>" * (n // 10),
    "template_end":   lambda n: "<div>" * n + "</template>" * n,
    "li_spam":        lambda n: "<div>" * n + "<li></li>" * (n // 8),
    "a_restart":      lambda n: "<div>" * n + "<a><a>" * (n // 8),
    "nobr_spam":      lambda n: "<div>" * n + "<nobr>x" * (n // 5),
    "meta_passthru":  lambda n: "<div>" * n + "<meta>" * (n // 8),
    "foster_elems":   lambda n: "<div><table>" + "<b></b>" * n,
    "foster_text":    lambda n: "<div><table>" + "x<i></i>" * n,
    "aa_children":    lambda n: "<b><div>" + "<span>s</span>" * n + "</b>",
    "afe_distinct":   lambda n: "".join(f"<b a={i}>" for i in range(n)) + "x",
    "afe_close":      lambda n: "".join(f"<i b={i}>" for i in range(n)) + "</i>" * n,
    "afe_evict":      lambda n: ("".join(f"<b a={i}>" for i in range(n // 2))
                                 + "<b a=0>" * n),
    "attr_flood":     lambda n: "<div " + " ".join(f"a{i}=v" for i in range(n)) + ">x",
    "comment_spam":   lambda n: "<!--x-->" * n,
    "charref_spam":   lambda n: "&notin;" * n,
    "select_reset":   lambda n: "<div>" * n + "<select><option>a</select>" * (n // 25),
    "caption_spam":   lambda n: "<div>" * n + "</caption>" * n,
    "pop_churn":      lambda n: "<div>" * n + "</div><p></p>" * (n // 6),
    # fmt element DEEP BELOW the tall stack (review-found regression:
    # per-iteration AA renotes made these super-quadratic)
    "a_fmt_deep":     lambda n: "<a>" + "<div>" * n + "</a>" * (n // 8),
    "b_fmt_deep":     lambda n: ("".join(f"<b a={i}>" for i in range(n // 4))
                                 + "<div>" * n + "</b>" * (n // 4)),
    "em_del_suffix":  lambda n: "<a>" + "<em>" * (n // 2) + "<div>" * n + "</a>",
}


def wall(doc):
    t0 = time.perf_counter()
    extract_document(doc)
    return time.perf_counter() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    bad = []
    for name, gen in SHAPES.items():
        a, b = wall(gen(n)), wall(gen(2 * n))
        r = b / max(a, 1e-9)
        if r > 3.0 and b > 0.3:
            bad.append(name)
        print(f"{name:16s} N:{a:6.3f}s 2N:{b:6.3f}s ratio {r:4.1f}"
              + ("  <-- SUPER-LINEAR" if name in bad else ""))
    print("SUPER-LINEAR:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
