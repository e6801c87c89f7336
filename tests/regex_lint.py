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
  is resolved at every package-internal call site of that function,
  with each argument resolved in the CALLER's module environment
  (round-12 self-review: resolving caller nodes in the callee's
  environment silently matched the wrong constants). A bare function
  name defined in more than one module poisons its parameters to
  unresolved instead of unioning unrelated call sites.

Call-site spellings in scope: ``F.<fn>``, ``<alias>.<fn>`` where the
alias binds ``pyspark.sql.functions`` (``import pyspark.sql.functions
as sf`` / ``from pyspark.sql import functions as sf``), bare names
bound by ``from pyspark.sql.functions import <fn>``, any bare
``regexp_*`` call, and ``<expr>.rlike``.

A site whose pattern cannot be statically resolved (e.g. a
user-supplied pattern) is reported as *unresolved* and must appear in
the caller's frozen allowlist — silence is never success.
"""

from __future__ import annotations

import ast
import os
from dataclasses import dataclass

# Spark DataFrame-API regex entry points -> index of the pattern
# argument.  ``split`` is matched only through a pyspark.sql.functions
# binding (str.split / re.split are different engines, out of scope —
# Python UDF bodies are pinned by tests/test_udf_battery.py);
# ``rlike`` only exists on Columns so any ``<expr>.rlike(pat)`` is in
# scope; bare ``regexp_*`` names are unambiguous and always in scope.
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
_PYSPARK_FUNCTIONS = ("pyspark.sql.functions",)
_MAX_CANDIDATES = 64  # cap the concat cross-product
_POISONED = object()  # parameter whose call sites cannot be trusted


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
        # aliases that bind pyspark.sql.functions itself
        self.pyspark_f_aliases: set[str] = set()
        # bare name -> canonical pyspark.sql.functions function name
        self.pyspark_fn_names: dict[str, str] = {}


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
        # bare function name -> list of (rel, FunctionDef)
        self._defs_by_name: dict[str, list[tuple[str, ast.FunctionDef]]] = {}
        # bare function name -> list of (caller rel, Call node)
        self._calls_of: dict[str, list[tuple[str, ast.Call]]] = {}
        self._param_cache: dict[tuple[str, str], dict] = {}

    # -- environment construction -------------------------------------
    def _collect(self) -> None:
        for rel, info in self.modules.items():
            for node in info.tree.body:
                for name, value in _target_names(node):
                    info.consts.setdefault(name, []).append(value)
                if isinstance(node, ast.Import):
                    for alias in node.names:
                        if alias.name in _PYSPARK_FUNCTIONS:
                            info.pyspark_f_aliases.add(
                                alias.asname or alias.name.split(".")[-1]
                            )
                elif isinstance(node, ast.ImportFrom):
                    if node.level == 0:
                        if node.module == "pyspark.sql":
                            for alias in node.names:
                                if alias.name == "functions":
                                    info.pyspark_f_aliases.add(
                                        alias.asname or alias.name
                                    )
                        elif node.module in _PYSPARK_FUNCTIONS:
                            for alias in node.names:
                                info.pyspark_fn_names[
                                    alias.asname or alias.name
                                ] = alias.name
                        continue
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
                    self._defs_by_name.setdefault(fn.name, []).append(
                        (rel, fn)
                    )

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
        params: dict,
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
                resolved = params[node.id]
                # Already-resolved strings from the callers' environments
                # (or _POISONED when the call-site set is untrustworthy).
                if resolved is _POISONED or resolved is None:
                    return None
                return list(resolved)[:_MAX_CANDIDATES]
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
        """Package-internal call sites by bare function name, keeping
        the CALLER's module — arguments are later resolved in that
        caller's environment (module consts only; a function-local
        argument fails resolution and poisons the parameter, which is
        reported, never silently passed)."""
        for rel, info in self.modules.items():
            for node in ast.walk(info.tree):
                if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
                    self._calls_of.setdefault(node.func.id, []).append(
                        (rel, node)
                    )

    def _param_candidates(self, rel: str, fn: ast.FunctionDef) -> dict:
        """Pre-resolved string candidates per parameter of `fn`, from
        package-internal call sites. _POISONED when any site's argument
        cannot be resolved in ITS caller's module environment, or when
        the bare name is defined in more than one module (call sites
        cannot be attributed)."""
        key = (rel, fn.name)
        if key in self._param_cache:
            return self._param_cache[key]
        out: dict = {}
        if len(self._defs_by_name.get(fn.name, [])) > 1:
            out = {a.arg: _POISONED for a in fn.args.args}
            self._param_cache[key] = out
            return out
        arg_names = [a.arg for a in fn.args.args]

        def feed(pname: str, value_node: ast.expr, caller_rel: str) -> None:
            if out.get(pname) is _POISONED:
                return
            caller_info = self.modules[caller_rel]
            r = self._resolve(value_node, caller_info, {}, {})
            if r is None:
                out[pname] = _POISONED
            else:
                out.setdefault(pname, []).extend(r)

        for site_rel, call in self._calls_of.get(fn.name, []):
            for i, arg in enumerate(call.args):
                if i < len(arg_names):
                    feed(arg_names[i], arg, site_rel)
            for kw in call.keywords:
                if kw.arg:
                    feed(kw.arg, kw.value, site_rel)
        self._param_cache[key] = out
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

    def _spark_fn_call(self, call: ast.Call, info: _ModuleInfo):
        """(canonical fn name, pattern arg index) when `call` is a
        pyspark.sql.functions regex call under any in-scope spelling."""
        f = call.func
        if isinstance(f, ast.Attribute):
            if f.attr in _F_CALLS and isinstance(f.value, ast.Name):
                alias = f.value.id
                if alias == "F" or alias in info.pyspark_f_aliases:
                    return f.attr, _F_CALLS[f.attr]
            if f.attr in _METHOD_CALLS:
                return f.attr, _METHOD_CALLS[f.attr]
            return None
        if isinstance(f, ast.Name):
            canonical = info.pyspark_fn_names.get(f.id)
            if canonical in _F_CALLS:
                return canonical, _F_CALLS[canonical]
            # bare regexp_* is unambiguous regardless of import style
            if f.id in _F_CALLS and f.id.startswith("regexp_"):
                return f.id, _F_CALLS[f.id]
        return None

    def _check_call(self, call, info, local_env, scope_name, params):
        hit = self._spark_fn_call(call, info)
        if hit is None:
            return
        call_name, idx = hit
        pat_node = None
        if len(call.args) > idx:
            pat_node = call.args[idx]
        else:
            for kw in call.keywords:
                if kw.arg == "pattern":
                    pat_node = kw.value
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
