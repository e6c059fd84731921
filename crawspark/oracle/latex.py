"""LaTeX source → text block extraction (the arXiv-pipeline staple).

Scientific corpora arrive as .tex sources; training pipelines strip
them to prose. The mechanics that matter (and the classic bugs each
guards against):

- ``%`` comments strip to end of line — but ``\\%`` is a literal
  percent (the naive regex eats half the document).
- Sectioning commands (``\\section{X}`` etc.) emit their argument as
  its own block; text-wrapping commands (``\\textbf``, ``\\emph``,
  ``\\texttt``, ...) unwrap to their argument, with NESTED braces
  handled by a real brace scanner, not a regex.
- Argument-swallowing commands (``\\cite``, ``\\ref``, ``\\label``,
  ``\\includegraphics``, ``\\usepackage``, ...) drop with their
  arguments (incl. ``[...]`` optionals).
- Math: inline ``$...$`` / ``\\(...\\)`` and display ``$$..$$`` /
  ``\\[...\\]`` / ``equation`` environments are replaced by a MATH
  placeholder token (count preserved — pipelines filter on math
  density); ``\\$`` stays a literal dollar.
- Skipped environments: ``tabular``, ``figure`` bodies (captions are
  hoisted first), ``thebibliography``, ``verbatim`` (kept VERBATIM —
  no command stripping inside), comment environments.
- Paragraphs split on blank lines; ``~`` is a non-breaking space,
  ``\\\\`` a line break; ``{``/``}`` grouping braces vanish.

``extract_latex`` returns block texts in document order.
``make_latex`` + ``latex_blocks_expected`` form the closed-form pair.
"""

from __future__ import annotations

import re

_WRAP = {"textbf", "textit", "emph", "texttt", "textsc", "underline",
         "mbox", "text"}
_SECTION = {"title", "section", "subsection", "subsubsection",
            "paragraph", "chapter"}
_DROP_ARG = {"cite", "citep", "citet", "ref", "eqref", "label",
             "includegraphics", "usepackage", "documentclass", "input",
             "include", "bibliography", "bibliographystyle", "footnote",
             "vspace", "hspace", "author", "date", "pagestyle"}
_SKIP_ENVS = {"tabular", "thebibliography", "comment", "tikzpicture"}


def _brace_arg(text: str, i: int) -> tuple[str, int]:
    """text[i] == '{' → (content, index past the matching brace)."""
    depth, j = 1, i + 1
    while j < len(text) and depth:
        if text[j] == "\\" and j + 1 < len(text):
            j += 2
            continue
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
        j += 1
    return text[i + 1:j - 1], j


def _skip_opt(text: str, i: int) -> int:
    if i < len(text) and text[i] == "[":
        end = text.find("]", i)
        return end + 1 if end >= 0 else len(text)
    return i


def extract_latex(text: str) -> list[str]:
    """Block texts in document order. Never raises."""
    out_blocks: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        joined = "".join(buf)
        buf.clear()
        for para in re.split(r"\n\s*\n", joined):
            para = re.sub(r"\s+", " ", para).strip()
            if para:
                out_blocks.append(para)

    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "\\":
            nxt = text[i + 1:i + 2]
            if nxt in ("%", "$", "&", "#", "_", "{", "}"):
                buf.append(nxt)
                i += 2
                continue
            if nxt == "\\":
                buf.append("\n")
                i += 2
                continue
            if nxt == "(":
                end = text.find("\\)", i)
                buf.append(" MATH ")
                i = (end + 2) if end >= 0 else n
                continue
            if nxt == "[":
                end = text.find("\\]", i)
                buf.append(" MATH ")
                i = (end + 2) if end >= 0 else n
                continue
            m = re.match(r"\\([a-zA-Z]+)\*?", text[i:])
            if not m:
                i += 1
                continue
            cmd = m.group(1)
            j = i + m.end()
            while j < n and text[j] == " ":
                break  # keep following space handling simple
            if cmd == "begin":
                envm = re.match(r"\s*\{([a-zA-Z*]+)\}", text[j:])
                env = envm.group(1) if envm else ""
                j2 = j + (envm.end() if envm else 0)
                if env in ("equation", "equation*", "align", "align*",
                           "eqnarray", "displaymath"):
                    end = text.find(f"\\end{{{env}}}", j2)
                    buf.append(" MATH ")
                    i = (end + len(f"\\end{{{env}}}")) if end >= 0 else n
                    continue
                if env in ("verbatim", "verbatim*"):
                    end = text.find(f"\\end{{{env}}}", j2)
                    flush()
                    out_blocks.append(
                        text[j2:end if end >= 0 else n].strip("\n"))
                    i = (end + len(f"\\end{{{env}}}")) if end >= 0 else n
                    continue
                if env in _SKIP_ENVS:
                    end = text.find(f"\\end{{{env}}}", j2)
                    i = (end + len(f"\\end{{{env}}}")) if end >= 0 else n
                    continue
                if env == "figure" or env == "figure*":
                    # hoist the caption, drop the rest of the body
                    end = text.find(f"\\end{{{env}}}", j2)
                    body = text[j2:end if end >= 0 else n]
                    cm = body.find("\\caption")
                    if cm >= 0:
                        k = cm + len("\\caption")
                        k = _skip_opt(body, k)
                        if k < len(body) and body[k] == "{":
                            cap, _ = _brace_arg(body, k)
                            flush()
                            out_blocks.append(re.sub(
                                r"\s+", " ",
                                "".join(extract_latex(cap))).strip())
                    i = (end + len(f"\\end{{{env}}}")) if end >= 0 else n
                    continue
                i = j2  # transparent environment: keep walking inside
                continue
            if cmd == "end":
                envm = re.match(r"\s*\{([a-zA-Z*]+)\}", text[j:])
                i = j + (envm.end() if envm else 0)
                continue
            if cmd in _SECTION:
                j = _skip_opt(text, j)
                if j < n and text[j] == "{":
                    arg, j = _brace_arg(text, j)
                    flush()
                    inner = extract_latex(arg)
                    out_blocks.append(" ".join(inner) if inner else "")
                i = j
                continue
            if cmd in _WRAP:
                if j < n and text[j] == "{":
                    arg, j = _brace_arg(text, j)
                    buf.append("".join(extract_latex_inline(arg)))
                i = j
                continue
            if cmd in _DROP_ARG:
                j = _skip_opt(text, j)
                while j < n and text[j] == "{":
                    _, j = _brace_arg(text, j)
                    j = _skip_opt(text, j)
                i = j
                continue
            # unknown command: drop the command token, keep its text
            i = j
            continue
        if ch == "%":
            end = text.find("\n", i)
            i = (end + 1) if end >= 0 else n
            continue
        if ch == "$":
            if text[i + 1:i + 2] == "$":
                end = text.find("$$", i + 2)
                buf.append(" MATH ")
                i = (end + 2) if end >= 0 else n
                continue
            end = text.find("$", i + 1)
            buf.append(" MATH ")
            i = (end + 1) if end >= 0 else n
            continue
        if ch == "~":
            buf.append(" ")
            i += 1
            continue
        if ch in "{}":
            i += 1
            continue
        buf.append(ch)
        i += 1
    flush()
    return out_blocks


def extract_latex_inline(fragment: str) -> list[str]:
    """extract_latex for a brace-argument fragment: inline join, no
    paragraph splitting side effects."""
    return [" ".join(extract_latex(fragment))]


def latex_blocks_expected(doc_id: int) -> list[str]:
    """Closed form of make_latex's blocks."""
    d = doc_id
    out = [f"doc {d} latex title"]
    for s in range(1 + d % 2):
        out.append(f"section {d} {s}")
        for p in range(1 + (d + s) % 3):
            t = (f"doc {d} body {s} {p} with bold{p} and MATH "
                 f"inline tail {p}")
            if (d + s + p) % 2 == 1:
                t += " 100% sure"
            out.append(t)
    out.append(f"figure caption {d} here")
    out.append("MATH")  # the display equation is its own paragraph
    out.append(f"verb@{d} **raw**")
    return out


def make_latex(doc_id: int) -> str:
    """Deterministic .tex exercising each mechanic: comments (and \\%
    literals), sectioning, nested wraps, cite/ref/label drops, inline
    + display math, a skipped tabular, a figure with hoisted caption,
    and a verbatim block."""
    d = doc_id
    lines = [
        "\\documentclass{article}",
        "\\usepackage[utf8]{inputenc}",
        f"\\title{{doc {d} latex title}}",
        "\\begin{document}",
        "% a comment line that must vanish",
    ]
    for s in range(1 + d % 2):
        lines.append(f"\\section{{section {d} {s}}} % trailing comment")
        for p in range(1 + (d + s) % 3):
            pct = (" 100\\% sure" if (d + s + p) % 2 == 1 else "")
            lines += [
                "",
                f"doc {d} body {s} {p} with \\textbf{{bold{p}}} "
                f"\\cite{{x{p}}}and $e=mc^2$ inline",
                f"tail~{p}\\label{{sec:{s}:{p}}}{pct}",
            ]
    lines += [
        "",
        "\\begin{tabular}{ll} a & b \\\\ c & d \\end{tabular}",
        "\\begin{figure}[h]\\includegraphics[width=1cm]{x.png}",
        f"\\caption{{figure caption {d} here}}\\end{{figure}}",
        "\\begin{equation} x^2 + y^2 = z^2 \\end{equation}",
        "\\begin{verbatim}",
        f"verb@{d} **raw**",
        "\\end{verbatim}",
        "\\end{document}",
    ]
    return "\n".join(lines)
