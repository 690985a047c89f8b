"""``crawlee``-style CLI: ``create`` + ``run`` (``python -m crawlee_spark``).

Reference surface (``packages/cli/src/index.ts``):

- ``crawlee create [project-name] --template t`` scaffolds a project from
  the template manifest, rewrites the project name into the manifest file,
  and refuses an existing directory
  (``CreateProjectCommand.ts:103-189``);
- ``crawlee run [--no-purge] [--script s]`` runs the project's named
  script with ``CRAWLEE_PURGE_ON_START=0`` exported when purging is
  disabled (``RunProjectCommand.ts:30-42``).

Spark mapping: templates are embedded (``crawlee_spark.templates``), the
project manifest is ``crawlee.json`` (name + script map — ``package.json``'s
role), and ``run`` dispatches the script through the shell with the same
env contract. The third reference command (``install-playwright-browsers``)
has no analog — there is no browser runtime here (SURVEY §2.5).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

from crawlee_spark.templates import MANIFEST, get_template, template_names

PROJECT_MANIFEST = "crawlee.json"


_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _validate_project_name(name: str) -> str | None:
    """Error message, or None when valid. The reference rejects only the
    empty string (CreateProjectCommand.ts:23-26); a directory scaffold that
    also substitutes the name into crawlee.json/README additionally needs
    it shell/JSON/regex-inert, so the charset is pinned to [A-Za-z0-9._-]
    (the same family the reference's name rewrite regex assumes)."""
    if not name:
        return "The project name cannot be empty string."
    if not _NAME_RE.match(name):
        return (f"Invalid project name {name!r}: use letters, digits, "
                f"'.', '_' or '-' (must start alphanumeric).")
    return None


def cmd_create(args: argparse.Namespace) -> int:
    err = _validate_project_name(args.project_name)
    if err:
        print(err, file=sys.stderr)
        return 1
    template = get_template(args.template)
    project_dir = os.path.join(os.getcwd(), args.project_name)
    try:
        os.mkdir(project_dir)
    except FileExistsError:
        # CreateProjectCommand.ts:166-169 (EEXIST): report, don't raise
        print(f"Cannot create new project, directory "
              f"{args.project_name!r} already exists.", file=sys.stderr)
        return 1
    try:
        for rel, content in template["files"].items():
            path = os.path.join(project_dir, rel)
            os.makedirs(os.path.dirname(path) or project_dir, exist_ok=True)
            content = content.replace("{project}", args.project_name)
            with open(path, "w") as f:
                f.write(content)
            if rel.endswith(".sh"):
                os.chmod(path, 0o755)
    except OSError as e:
        # never leave a half-written scaffold behind: a retry would then
        # refuse on "directory already exists" for a dir WE created
        import shutil

        shutil.rmtree(project_dir, ignore_errors=True)
        print(f"Failed to scaffold {args.project_name!r}: {e}",
              file=sys.stderr)
        return 1
    # name rewrite, CreateProjectCommand.ts:180 (package.json -> crawlee.json).
    # The name charset is validated above, but go through json anyway so the
    # manifest can never come out unparseable.
    mpath = os.path.join(project_dir, PROJECT_MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        manifest["name"] = args.project_name
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=4)
            f.write("\n")
    hint = template.get("run_hint", "python -m crawlee_spark run")
    print(f"Project {args.project_name} was created. To run it, run "
          f'"cd {args.project_name}" and "{hint}".')
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    if not os.path.exists(PROJECT_MANIFEST):
        print(f"No {PROJECT_MANIFEST} in the current directory — not a "
              f"crawlee_spark project.", file=sys.stderr)
        return 1
    try:
        with open(PROJECT_MANIFEST) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"Cannot read {PROJECT_MANIFEST}: {e}", file=sys.stderr)
        return 1
    scripts = manifest.get("scripts", {})
    if not isinstance(scripts, dict) or not all(
            isinstance(v, str) for v in scripts.values()):
        print(f"{PROJECT_MANIFEST} 'scripts' must map names to command "
              f"strings.", file=sys.stderr)
        return 1
    if args.script not in scripts:
        print(f"Script {args.script!r} not found in {PROJECT_MANIFEST} "
              f"(available: {sorted(scripts)}).", file=sys.stderr)
        return 1
    env = dict(os.environ)
    if not args.purge:
        # RunProjectCommand.ts:34-36: the env var is the purge switch
        env["CRAWLEE_PURGE_ON_START"] = "0"
    proc = subprocess.run(scripts[args.script], shell=True, env=env)
    return proc.returncode


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="crawlee_spark",
        description="Crawlee-on-Spark project CLI (create / run).")
    sub = p.add_subparsers(dest="command")

    c = sub.add_parser(
        "create",
        help="Create a new project directory from a boilerplate template.")
    c.add_argument("project_name", help="Name of the new project folder.")
    c.add_argument(
        "-t", "--template", choices=template_names(),
        default=MANIFEST["templates"][0]["name"],
        help="Template for the project (default: %(default)s).")
    c.set_defaults(func=cmd_create)

    r = sub.add_parser("run", help="Run the project in the current directory.")
    r.add_argument(
        "--no-purge", dest="purge", action="store_false",
        help="Disable automatic purging of default storages.")
    r.add_argument(
        "-s", "--script", default="start",
        help="crawlee.json script to run (default: %(default)s).")
    r.set_defaults(func=cmd_run)

    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not getattr(args, "command", None):
        parser.print_help()
        return 0
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
