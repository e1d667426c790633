"""Agent tool-calling surface (function schemas + dispatch).

Restates the reference's ``eschergraph/agents/tools.py:1-61`` —
``Tool`` / ``Parameter`` / ``Function`` — as plain dataclasses plus the
two things a provider actually needs: an OpenAI-compatible
function-calling JSON schema (the public ``{"type": "function", ...}``
wire format every major chat API accepts) and a dispatcher that
validates a model's tool call against the declared parameters before
executing. ``function_tool`` derives a declaration straight from a
Python callable's signature so pipeline entry points can be exposed to
an agent without hand-written schemas.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

_PY_TO_JSON = {
    str: "string",
    int: "integer",
    float: "number",
    bool: "boolean",
    list: "array",
    dict: "object",
}


class ToolException(ValueError):
    """A tool call that does not match its declaration."""


@dataclass
class Parameter:
    """One function argument as an agent sees it
    (reference ``agents/tools.py:19-47``)."""

    name: str
    type: str
    description: str = ""
    enum: list[str] | None = None
    is_required: bool = False

    def to_key(self) -> str:
        return self.name

    def to_value(self) -> dict:
        out: dict[str, Any] = {"type": self.type,
                               "description": self.description}
        if self.enum:
            out["enum"] = list(self.enum)
        return out


@dataclass
class FunctionTool:
    """A callable an agent may invoke
    (reference ``agents/tools.py:49-61``)."""

    name: str
    description: str
    parameters: list[Parameter] = field(default_factory=list)
    executor: Callable[..., Any] | None = None

    @property
    def required(self) -> list[str]:
        return [p.name for p in self.parameters if p.is_required]

    def to_schema(self) -> dict:
        """OpenAI-compatible function-calling declaration."""
        return {
            "type": "function",
            "function": {
                "name": self.name,
                "description": self.description,
                "parameters": {
                    "type": "object",
                    "properties": {
                        p.to_key(): p.to_value() for p in self.parameters
                    },
                    "required": self.required,
                },
            },
        }

    def validate_args(self, args: dict) -> dict:
        declared = {p.name: p for p in self.parameters}
        unknown = sorted(set(args) - set(declared))
        if unknown:
            raise ToolException(f"{self.name}: unknown argument(s) {unknown}")
        missing = sorted(set(self.required) - set(args))
        if missing:
            raise ToolException(f"{self.name}: missing required {missing}")
        for k, v in args.items():
            p = declared[k]
            if p.enum is not None and v not in p.enum:
                raise ToolException(
                    f"{self.name}: {k}={v!r} not in enum {p.enum}"
                )
        return args

    def __call__(self, **args):
        if self.executor is None:
            raise ToolException(f"{self.name} has no executor bound")
        return self.executor(**self.validate_args(args))


def function_tool(fn: Callable[..., Any],
                  descriptions: dict[str, str] | None = None) -> FunctionTool:
    """Derive a FunctionTool from a Python callable: parameter names,
    required-ness (no default => required), and JSON types from the
    annotations; the first docstring line becomes the description."""
    descriptions = descriptions or {}
    sig = inspect.signature(fn)
    params = []
    for name, p in sig.parameters.items():
        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        ann = p.annotation if p.annotation is not inspect.Parameter.empty else str
        params.append(
            Parameter(
                name=name,
                type=_PY_TO_JSON.get(ann, "string"),
                description=descriptions.get(name, ""),
                is_required=p.default is inspect.Parameter.empty,
            )
        )
    doc = (inspect.getdoc(fn) or "").strip().splitlines()
    return FunctionTool(
        name=fn.__name__,
        description=doc[0] if doc else "",
        parameters=params,
        executor=fn,
    )


class ToolBox:
    """Name->tool registry with call dispatch: the piece that consumes
    a model's ``{"name": ..., "arguments": {...}}`` tool call."""

    def __init__(self, tools: list[FunctionTool] | None = None):
        self._tools: dict[str, FunctionTool] = {}
        for t in tools or []:
            self.register(t)

    def register(self, tool: FunctionTool) -> None:
        if tool.name in self._tools:
            raise ToolException(f"duplicate tool name: {tool.name}")
        self._tools[tool.name] = tool

    def schemas(self) -> list[dict]:
        return [t.to_schema() for t in self._tools.values()]

    def dispatch(self, call: dict) -> Any:
        name = call.get("name")
        if name not in self._tools:
            raise ToolException(f"unknown tool: {name!r}")
        return self._tools[name](**dict(call.get("arguments") or {}))
