"""Prompt-templates-as-data with strict variable checking.

The reference treats every LLM prompt as a Jinja file under
``eschergraph/agents/prompts/`` rendered through
``agents/jinja_helper.py:16-44``, which refuses to render unless the
variables supplied EXACTLY match the variables the template declares
(both missing and extra keys are errors — a renamed template variable
fails loudly at the call site instead of silently emitting
``{{ old_name }}`` into a production prompt). This module restates
that surface: templates live in ``prompts/templates/`` (our own
wording, the reference's variable interfaces), ``process_template``
renders with the same strict set-equality check, and
``extract_variables`` exposes a template's declared interface for
tooling/tests.

Users customize prompts by editing the template files — no code
changes — exactly the workflow the reference supports.
"""

from __future__ import annotations

import re
from pathlib import Path

_TEMPLATE_DIR = Path(__file__).parent / "templates"
# the reference's pattern (jinja_helper.py:69) widened to tolerate the
# {{VAR}} spacing its search templates use
_VARIABLE_RE = re.compile(r"\{\{ *([A-Za-z_][\w]*) *\}\}")


class PromptFormattingException(ValueError):
    """A template's declared variables and the supplied data disagree
    (reference ``exceptions.PromptFormattingException``)."""


def template_path(template_file: str) -> Path:
    p = (_TEMPLATE_DIR / template_file).resolve()
    if not str(p).startswith(str(_TEMPLATE_DIR.resolve())):
        raise PromptFormattingException(
            f"template path escapes the prompt directory: {template_file}"
        )
    if not p.is_file():
        raise PromptFormattingException(
            f"unknown prompt template: {template_file}"
        )
    return p


def extract_variables(template_file: str) -> list[str]:
    """The variables a template declares, in order of first appearance
    (``jinja_helper.extract_variables`` analogue)."""
    seen: list[str] = []
    for name in _VARIABLE_RE.findall(template_path(template_file).read_text()):
        if name not in seen:
            seen.append(name)
    return seen


def process_template(template_file: str, data: dict[str, str]) -> str:
    """Render a prompt template (``jinja_helper.process_template``
    analogue): the supplied keys must EQUAL the template's declared
    variable set — missing AND extra keys both raise."""
    declared = set(extract_variables(template_file))
    supplied = set(data.keys())
    if declared != supplied:
        missing = sorted(declared - supplied)
        extra = sorted(supplied - declared)
        raise PromptFormattingException(
            f"template {template_file}: variable mismatch"
            + (f"; missing {missing}" if missing else "")
            + (f"; extra {extra}" if extra else "")
        )
    try:
        from jinja2 import Environment, FileSystemLoader, select_autoescape

        env = Environment(
            loader=FileSystemLoader(searchpath=str(_TEMPLATE_DIR)),
            autoescape=select_autoescape(),
        )
        return env.get_template(template_file).render(**data)
    except ImportError:
        # jinja2-free fallback: our templates only use {{ var }}
        # substitution, which the regex renders identically (jinja2
        # drops the final newline — keep_trailing_newline=False — so
        # mirror that for byte parity between the two paths)
        text = template_path(template_file).read_text()
        out = _VARIABLE_RE.sub(lambda m: str(data[m.group(1)]), text)
        return out[:-1] if out.endswith("\n") else out


def list_templates() -> list[str]:
    """Every shipped template, relative to the template root."""
    return sorted(
        str(p.relative_to(_TEMPLATE_DIR))
        for p in _TEMPLATE_DIR.rglob("*.jinja")
    )
