"""CLI: fetch reference pretrained checkpoints (Google Drive token flow).

Replaces the reference's ``models/download_pts.py`` (requests-based
gdown-style downloader, `/root/reference/models/download_pts.py:6-31`)
with a stdlib-urllib implementation, then optionally converts straight to
framework params via `cli/convert_weights.py`.

Known reference artifacts (same Drive ids the reference hardcodes):
  nyu   — NNET surface-normal net trained on NYUv2 (``nyu.pt``)

Usage:
    python -m sndepth_tpu.cli.download_checkpoints nyu --dest checkpoints/
    python -m sndepth_tpu.cli.download_checkpoints --id <drive-id> \
        --dest checkpoints/ --name_out custom.pt

Requires network egress; in sealed environments place the files manually
and run the converter directly.
"""

from __future__ import annotations

import argparse
import http.cookiejar
import os
import urllib.parse
import urllib.request

_KNOWN = {
    # name -> (drive file id, filename)   (download_pts.py:38-47)
    "nyu": ("1RNiYw5rrqgBf3OkFSCSSQ67s0HMBpkAv", "nyu.pt"),
}

_URL = "https://docs.google.com/uc?export=download"
_CHUNK = 32768


def _parse_confirm_form(html: str) -> tuple[str, dict] | None:
    """Extract (action_url, hidden fields) from Drive's interstitial
    'can't scan for viruses' confirm form, if present."""
    import re
    m = re.search(r'<form[^>]+action="([^"]+)"', html)
    if not m:
        return None
    action = m.group(1).replace("&amp;", "&")
    fields = dict(re.findall(
        r'<input[^>]+name="([^"]+)"[^>]+value="([^"]*)"', html))
    return action, fields


def download_file_from_google_drive(file_id: str, destination: str) -> None:
    """Drive download, handling the large-file confirm interstitial.

    Modern Drive returns an HTML form (not a download_warning cookie) for
    files too large to virus-scan; we parse and resubmit it. The body is
    only written once the response is verifiably not an HTML page, so a
    quota/error interstitial can never be silently saved as a checkpoint.
    """
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar))

    def fetch(url: str, params: dict):
        return opener.open(url + "?" + urllib.parse.urlencode(params))

    resp = fetch(_URL, {"id": file_id})
    ctype = resp.headers.get("Content-Type", "")
    if "text/html" in ctype:
        # Legacy cookie-token flow, then the current interstitial form.
        token = next((c.value for c in jar
                      if c.name.startswith("download_warning")), None)
        if token:
            resp = fetch(_URL, {"id": file_id, "confirm": token})
        else:
            form = _parse_confirm_form(
                resp.read().decode("utf-8", "replace"))
            if form is None:
                raise RuntimeError(
                    f"Drive returned an HTML page with no confirm form for "
                    f"id={file_id} (quota exceeded or file removed?); "
                    f"refusing to save it as {destination}")
            action, fields = form
            resp = fetch(action, fields)
        ctype = resp.headers.get("Content-Type", "")
        if "text/html" in ctype:
            raise RuntimeError(
                f"Drive confirm flow still returned text/html for "
                f"id={file_id}; refusing to write {destination}")

    with open(destination, "wb") as f:
        while True:
            chunk = resp.read(_CHUNK)
            if not chunk:
                break
            f.write(chunk)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("name", nargs="?", choices=sorted(_KNOWN),
                   help="known checkpoint to fetch")
    p.add_argument("--id", help="explicit Drive file id")
    p.add_argument("--name_out", default=None, help="output filename")
    p.add_argument("--dest", default="checkpoints")
    args = p.parse_args(argv)

    if not args.name and not args.id:
        p.error("give a known checkpoint name or --id")
    file_id, fname = _KNOWN[args.name] if args.name else (
        args.id, args.name_out or f"{args.id}.pt")
    if args.name_out:
        fname = args.name_out

    os.makedirs(args.dest, exist_ok=True)
    out = os.path.join(args.dest, fname)
    if os.path.exists(out):
        print(f"{out} already exists; skipping")
        return
    print(f"downloading {fname} ...")
    download_file_from_google_drive(file_id, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
