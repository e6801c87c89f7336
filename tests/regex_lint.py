"""AST-level Java-vs-RE2 regex lint (VERDICT r11 §Next 2).

Spark compiles ``java.util.regex`` while every DuckDB oracle compiles
RE2, and the engines disagree on three pattern classes (all probed
live in round 11):

- ``\\s``/``\\S``: Java's ``\\s`` additionally matches ``\\x0B`` —
  spell the whitespace class explicitly.
- bare ``$``: Java matches BEFORE a final line terminator, RE2 means
  end-of-text — use ``\\z`` (Java end-of-input == RE2 ``$``).
- naked ``.``: Java ``.`` excludes ``\\r``/NEL/LSEP while RE2 ``.``
  excludes only ``\\n`` — spell the class.

Round 11's lint only saw double-quoted literals on the same physical
line as a recognized Spark call token; a pattern held in a variable,
built by concatenation, an f-string, a single-quoted string, or a
multi-line call escaped it (ADVICE r11).  This module parses every
package source with ``ast`` and binds string values to the actual
regex-argument position of each Spark regex call, resolving:

- constants (any quoting style, raw strings, implicit concatenation),
- ``Name`` references through function-local then module-level
  assignments (every assigned candidate is checked),
- ``module.NAME`` attributes through ``import``/``from .. import``
  aliases into the target module's constants,
- ``+`` concatenations and f-strings of resolvable parts,
- ``F.lit(x)`` wrappers,
- one inter-procedural level: a pattern that is a function PARAMETER
  is resolved at every package-internal call site of that function.

A site whose pattern cannot be statically resolved (e.g. a
user-supplied pattern) is reported as *unresolved* and must appear in
the caller's frozen allowlist — silence is never success.
"""

from __future__ import annotations

import ast
import os
from dataclasses import dataclass

# Spark DataFrame-API regex entry points -> index of the pattern
# argument.  ``split``/``regexp_*`` are matched only as ``F.<name>``
# (str.split / re.split are different engines, out of scope — Python
# UDF bodies are pinned by tests/test_udf_battery.py); ``rlike`` only
# exists on Columns so any ``<expr>.rlike(pat)`` is in scope.
_F_CALLS = {
    "regexp_extract": 1,
    "regexp_replace": 1,
    "regexp_count": 1,
    "regexp_like": 1,
    "regexp_instr": 1,
    "regexp_substr": 1,
    "regexp_extract_all": 1,
    "split": 1,
}
_METHOD_CALLS = {"rlike": 0}
_MAX_CANDIDATES = 64  # cap the concat cross-product


@dataclass(frozen=True)
class Violation:
    rel: str
    lineno: int
    message: str

    def __str__(self) -> str:  # pragma: no cover - assertion text
        return f"{self.rel}:{self.lineno}: {self.message}"


@dataclass(frozen=True)
class UnresolvedSite:
    rel: str
    func: str  # enclosing function ('<module>' at top level)
    call: str  # the Spark call attr, e.g. 'regexp_extract_all'

    def key(self) -> tuple:
        return (self.rel, self.func, self.call)


def _naked_outside_class(pattern: str, target: str) -> bool:
    """True if `target` appears unescaped outside a [...] class."""
    esc = False
    in_class = False
    for ch in pattern:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
        elif ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
        elif ch == target and not in_class:
            return True
    return False


def check_pattern(pattern: str) -> list[str]:
    """The three Java-vs-RE2 divergence checks on a final string value."""
    problems = []
    if "\\s" in pattern or "\\S" in pattern:
        problems.append(
            f"\\s/\\S shorthand in {pattern!r}"
            " (Java adds \\x0B vs RE2 — spell the class)"
        )
    if _naked_outside_class(pattern, "$"):
        problems.append(
            f"bare $ anchor in {pattern!r}"
            " (Java matches before a trailing newline — use \\z)"
        )
    if _naked_outside_class(pattern, "."):
        problems.append(
            f"naked . in {pattern!r}"
            " (Java . excludes \\r/NEL/LSEP, RE2 . excludes only \\n —"
            " spell the class)"
        )
    return problems


class _ModuleInfo:
    def __init__(self, rel: str, tree: ast.Module):
        self.rel = rel
        self.tree = tree
        # name -> list of candidate value nodes (module level)
        self.consts: dict[str, list[ast.expr]] = {}
        # local alias -> module rel path (for Attribute resolution)
        self.mod_aliases: dict[str, str] = {}
        # local name -> (module rel path, remote name) for from-imports
        self.from_imports: dict[str, tuple[str, str]] = {}


def _target_names(node: ast.stmt):
    if isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                yield t.id, node.value
    elif isinstance(node, ast.AnnAssign) and node.value is not None:
        if isinstance(node.target, ast.Name):
            yield node.target.id, node.value


def _rel_for_import(cur_rel: str, module: str | None, level: int) -> str | None:
    """Map a (possibly relative) import to a package-relative .py path."""
    if level == 0:
        return None  # absolute import — outside the package walk
    base = cur_rel.split("/")[:-1]
    up = level - 1
    if up > len(base):
        return None
    parts = base[: len(base) - up]
    if module:
        parts += module.split(".")
    return "/".join(parts)


class _Linter:
    def __init__(self, modules: dict[str, _ModuleInfo]):
        self.modules = modules
        self.violations: list[Violation] = []
        self.unresolved: list[UnresolvedSite] = []
        # (rel, func_name) -> list of (param_index_map, call nodes) for
        # one-level inter-procedural resolution
        self._func_defs: dict[tuple[str, str], ast.FunctionDef] = {}
        self._calls_of: dict[str, list[tuple[str, ast.Call, dict]]] = {}

    # -- environment construction -------------------------------------
    def _collect(self) -> None:
        for rel, info in self.modules.items():
            for node in info.tree.body:
                for name, value in _target_names(node):
                    info.consts.setdefault(name, []).append(value)
                if isinstance(node, ast.ImportFrom):
                    target = _rel_for_import(rel, node.module, node.level)
                    if target is None:
                        continue
                    for alias in node.names:
                        bound = alias.asname or alias.name
                        mod_rel = f"{target}/{alias.name}"
                        if self._find_module(mod_rel) is not None:
                            info.mod_aliases[bound] = mod_rel
                        else:
                            info.from_imports[bound] = (target, alias.name)
            for fn in ast.walk(info.tree):
                if isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    self._func_defs[(rel, fn.name)] = fn

    def _find_module(self, rel_no_ext: str) -> _ModuleInfo | None:
        for cand in (rel_no_ext + ".py", rel_no_ext + "/__init__.py"):
            if cand in self.modules:
                return self.modules[cand]
        return None

    # -- resolution -----------------------------------------------------
    def _resolve(
        self,
        node: ast.expr,
        info: _ModuleInfo,
        local_env: dict[str, list[ast.expr]],
        params: dict[str, list[ast.expr]],
        depth: int = 0,
    ) -> list[str] | None:
        """All statically-known string values of `node`, or None."""
        if depth > 12:
            return None
        if isinstance(node, ast.Constant):
            return [node.value] if isinstance(node.value, str) else None
        if isinstance(node, ast.Name):
            cands = local_env.get(node.id) or info.consts.get(node.id)
            if cands is None and node.id in params:
                cands = params[node.id]
            if cands is None and node.id in info.from_imports:
                target, remote = info.from_imports[node.id]
                mod = self._find_module(target)
                if mod is not None and remote in mod.consts:
                    return self._resolve_many(
                        mod.consts[remote], mod, {}, {}, depth + 1
                    )
                return None
            if cands is None:
                return None
            return self._resolve_many(cands, info, local_env, params, depth + 1)
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            mod_rel = info.mod_aliases.get(node.value.id)
            if mod_rel is None:
                return None
            mod = self._find_module(mod_rel)
            if mod is None or node.attr not in mod.consts:
                return None
            return self._resolve_many(mod.consts[node.attr], mod, {}, {}, depth + 1)
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            left = self._resolve(node.left, info, local_env, params, depth + 1)
            right = self._resolve(node.right, info, local_env, params, depth + 1)
            if left is None or right is None:
                return None
            out = [a + b for a in left for b in right]
            return out[:_MAX_CANDIDATES]
        if isinstance(node, ast.JoinedStr):
            parts: list[list[str]] = []
            for v in node.values:
                if isinstance(v, ast.Constant):
                    parts.append([v.value])
                elif isinstance(v, ast.FormattedValue):
                    r = self._resolve(v.value, info, local_env, params, depth + 1)
                    if r is None:
                        return None
                    parts.append(r)
                else:
                    return None
            out = [""]
            for p in parts:
                out = [a + b for a in out for b in p][:_MAX_CANDIDATES]
            return out
        if isinstance(node, ast.Call):
            # F.lit(x) wraps a literal pattern
            f = node.func
            if (
                isinstance(f, ast.Attribute)
                and f.attr == "lit"
                and len(node.args) == 1
            ):
                return self._resolve(node.args[0], info, local_env, params, depth + 1)
            return None
        return None

    def _resolve_many(self, nodes, info, local_env, params, depth):
        out: list[str] = []
        for n in nodes:
            r = self._resolve(n, info, local_env, params, depth)
            if r is None:
                return None
            out.extend(r)
        return out[:_MAX_CANDIDATES]

    # -- the walk ---------------------------------------------------------
    def run(self) -> None:
        self._collect()
        self._index_calls()
        for rel, info in self.modules.items():
            self._walk_scope(info.tree.body, info, {}, "<module>", {})

    def _index_calls(self) -> None:
        """Package-internal call sites by bare function name, with the
        local env of the enclosing scope — for one-level parameter
        resolution."""
        for rel, info in self.modules.items():
            for node in ast.walk(info.tree):
                if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
                    self._calls_of.setdefault(node.func.id, []).append(
                        (rel, node, {})
                    )

    def _param_candidates(
        self, rel: str, fn: ast.FunctionDef
    ) -> dict[str, list[ast.expr]]:
        """Arguments passed to `fn` at package-internal call sites,
        mapped to parameter names (one inter-procedural level)."""
        arg_names = [a.arg for a in fn.args.args]
        out: dict[str, list[ast.expr]] = {}
        for site_rel, call, _env in self._calls_of.get(fn.name, []):
            for i, arg in enumerate(call.args):
                if i < len(arg_names):
                    out.setdefault(arg_names[i], []).append(arg)
            for kw in call.keywords:
                if kw.arg:
                    out.setdefault(kw.arg, []).append(kw.value)
        return out

    def _walk_scope(self, body, info, local_env, scope_name, params):
        for stmt in body:
            for name, value in _target_names(stmt):
                local_env.setdefault(name, []).append(value)
        for stmt in body:
            self._visit(stmt, info, local_env, scope_name, params)

    def _visit(self, node, info, local_env, scope_name, params):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fn_params = self._param_candidates(info.rel, node)
            self._walk_scope(
                node.body, info, dict(local_env), node.name, fn_params
            )
            return
        for child in ast.iter_child_nodes(node):
            if isinstance(child, ast.Call):
                self._check_call(child, info, local_env, scope_name, params)
            self._visit(child, info, local_env, scope_name, params)

    def _check_call(self, call, info, local_env, scope_name, params):
        f = call.func
        pat_node = None
        call_name = None
        if isinstance(f, ast.Attribute):
            if (
                f.attr in _F_CALLS
                and isinstance(f.value, ast.Name)
                and f.value.id == "F"
            ):
                call_name = f.attr
                idx = _F_CALLS[f.attr]
                if len(call.args) > idx:
                    pat_node = call.args[idx]
                else:
                    for kw in call.keywords:
                        if kw.arg == "pattern":
                            pat_node = kw.value
            elif f.attr in _METHOD_CALLS:
                call_name = f.attr
                idx = _METHOD_CALLS[f.attr]
                if len(call.args) > idx:
                    pat_node = call.args[idx]
        if call_name is None:
            return
        if pat_node is None:
            self.unresolved.append(
                UnresolvedSite(info.rel, scope_name, call_name)
            )
            return
        values = self._resolve(pat_node, info, local_env, params)
        if values is None:
            self.unresolved.append(
                UnresolvedSite(info.rel, scope_name, call_name)
            )
            return
        for v in values:
            for problem in check_pattern(v):
                self.violations.append(
                    Violation(info.rel, call.lineno, f"{call_name}: {problem}")
                )


def lint_sources(sources: dict[str, str]):
    """Lint {relpath: source_text}. Returns (violations, unresolved)."""
    modules = {
        rel: _ModuleInfo(rel, ast.parse(text, filename=rel))
        for rel, text in sources.items()
    }
    linter = _Linter(modules)
    linter.run()
    return linter.violations, linter.unresolved


def lint_package(root: str):
    """Lint every .py under `root` (package source tree)."""
    sources = {}
    for dirpath, _dirs, files in os.walk(root):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            with open(path, encoding="utf-8") as fh:
                sources[rel] = fh.read()
    return lint_sources(sources)
