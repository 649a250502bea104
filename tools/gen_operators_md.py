"""Regenerate docs/OPERATORS.md from __ray_entry__.queries().

Run from the repo root: python tools/gen_operators_md.py
(owns its own Ray session like other CLI entry points)."""
import inspect
import sys

sys.path.insert(0, ".")


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as em

    q = em.queries()
    twins = set(em.oracle_sql())
    lines = [
        "# Operator index (auto-generated from `__ray_entry__.queries()`)",
        "",
        f"{len(q)} queries, {len(twins)} DuckDB oracle twins. Every "
        "oracle-backed entry is verified BIT-EXACT at sf0.01 by "
        "tests/test_driver_exactness.py (the external gate's own "
        "comparison) and at sf0.001 by tests/test_conformance.py; "
        "rows-only entries carry pytest parity/error-bound/determinism "
        "pins named in their docstrings.",
        "",
        "| # | query | check | implementation | summary |",
        "|---|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(q.items(), 1):
        target = fn
        while hasattr(target, "func"):        # functools.partial
            target = target.func
        mod = getattr(target, "__module__", "?")
        qn = getattr(target, "__qualname__", "?")
        if "<lambda>" in qn:
            impl = "`__ray_entry__`"
            summary = "(thin lambda wrapper — see the called stage's docstring)"
        else:
            impl = f"`{mod}.{qn}`" if mod != "__ray_entry__" \
                else f"`__ray_entry__.{qn}`"
            doc = inspect.getdoc(target) or ""
            summary = " ".join(doc.split("\n")[:2]).strip() or \
                "(see docstring)"
        check = "oracle" if name in twins else "rows-only"
        summary = summary.replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {check} | {impl} | {summary} |")
    with open("docs/OPERATORS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/OPERATORS.md: {len(q)} queries, {len(twins)} twins")
    ray.shutdown()


if __name__ == "__main__":
    main()
