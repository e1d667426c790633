"""Prompt-templates-as-data: strict-variable render (reference
``agents/jinja_helper.py:16-44`` surface)."""

import pytest

from eschergraph_ray.prompts import (
    PromptFormattingException,
    extract_variables,
    list_templates,
    process_template,
)


def test_template_inventory_matches_reference_interface():
    # one template per reference prompt file, same variable interfaces
    assert list_templates() == [
        "community_prompt.jinja",
        "identifying_nodes.jinja",
        "json_build.jinja",
        "json_figure.jinja",
        "json_keywords.jinja",
        "json_property.jinja",
        "json_table.jinja",
        "search/global_search_context.jinja",
        "search/question_with_context.jinja",
        "summary.jinja",
    ]
    assert extract_variables("json_build.jinja") == ["input_text"]
    assert extract_variables("json_property.jinja") == [
        "current_nodes", "input_text",
    ]
    assert extract_variables("json_table.jinja") == [
        "table_caption", "keywords", "markdown_table",
    ]
    assert extract_variables("search/question_with_context.jinja") == [
        "QUERY", "CONTEXT",
    ]


def test_process_template_renders_variables():
    out = process_template("json_build.jinja", {"input_text": "XYZ-42"})
    assert "XYZ-42" in out
    assert "{{" not in out  # nothing left unrendered


def test_missing_variable_raises():
    with pytest.raises(PromptFormattingException, match="missing"):
        process_template("json_property.jinja", {"input_text": "t"})


def test_extra_variable_raises():
    with pytest.raises(PromptFormattingException, match="extra"):
        process_template(
            "summary.jinja", {"full_text": "t", "bogus": "x"}
        )


def test_unknown_template_raises():
    with pytest.raises(PromptFormattingException, match="unknown"):
        process_template("no_such.jinja", {})


def test_path_escape_rejected():
    with pytest.raises(PromptFormattingException):
        process_template("../__init__.py", {})


def test_fallback_renderer_matches_jinja():
    """The regex fallback (for a jinja2-free install) is byte-identical
    to the jinja2 path on every shipped template."""
    import re

    import eschergraph_ray.prompts as P

    data_by_tpl = {
        t: {v: f"<{v}>" for v in extract_variables(t)}
        for t in list_templates()
    }
    for t, data in data_by_tpl.items():
        via_jinja = process_template(t, data)
        text = P.template_path(t).read_text()
        via_regex = P._VARIABLE_RE.sub(lambda m: data[m.group(1)], text)
        via_regex = via_regex[:-1] if via_regex.endswith("\n") else via_regex
        assert via_jinja == via_regex, t
    assert re.match(r"\{\{ *([A-Za-z_][\w]*) *\}\}", "{{QUERY}}")


def test_provider_llm_uses_templates():
    """ProviderLLM's prompts come from the template files — editing a
    template changes the prompt with no code change."""
    from eschergraph_ray.providers import ProviderLLM

    sent = []

    class T:
        def complete(self, system, prompt, json_mode):
            sent.append(prompt)
            from eschergraph_ray.providers import TokenUsage

            return '{"entities": [], "relationships": []}', TokenUsage(1, 1, 2)

    llm = ProviderLLM(transport=T())
    llm.extract_nodes_edges("THE-CHUNK-TEXT")
    assert len(sent) == 1
    assert "THE-CHUNK-TEXT" in sent[0]
    # the template's own wording reached the transport
    assert "knowledge graph" in sent[0]
