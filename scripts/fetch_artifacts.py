"""Fetch the external artifacts the reference framework depends on.

TPU-native equivalent of the reference's `main/prepare/download_*.sh`
scripts (gdown/wget one-liners) plus the checkpoint/embedding downloads
its READMEs describe in prose (`/root/reference/README.md:44-75`,
`BEAT-TWH-main/Readme.md:35-104`). One manifest drives everything:

    python scripts/fetch_artifacts.py --list            # offline
    python scripts/fetch_artifacts.py --status          # offline
    python scripts/fetch_artifacts.py --fetch glove smpl_files
    python scripts/fetch_artifacts.py --all

Downloads use only the stdlib (urllib): plain HTTP(S) plus the Google
Drive confirm-token dance that `gdown` automates. Artifacts that sit
behind login walls / cloud folders (Tsinghua Cloud, Baidu, Google Drive
*folders*, the BEAT/TWH dataset portals) are `manual` entries: `--fetch`
prints the exact steps instead of failing cryptically. After a fetch,
the tool prints the framework command that consumes the artifact (e.g.
the torch->orbax checkpoint converter).

In a zero-egress environment every network fetch fails fast with a
clear message; `--list/--status` always work.
"""
from __future__ import annotations

import argparse
import dataclasses
import html.parser
import pathlib
import re
import shutil
import sys
import tarfile
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from typing import Optional, Sequence

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
DEFAULT_DEST = REPO_ROOT / "artifacts"

GDRIVE_FILE = "https://drive.google.com/uc?export=download&id={id}"


@dataclasses.dataclass(frozen=True)
class Source:
    kind: str          # "http" | "gdrive" | "manual"
    url: str           # http(s) URL, gdrive file id, or instructions page
    note: str = ""


@dataclasses.dataclass(frozen=True)
class Artifact:
    name: str
    desc: str
    sources: tuple     # tuple[Source, ...] — tried in order
    dest: str          # directory relative to --dest
    filename: str = "" # target file name ("" = from URL / server)
    post: str = ""     # "" | "unzip" | "untar" (auto-detects compression)
    marker: str = ""   # path under dest whose existence means "present"
                       # (defaults to `filename`; archives should set it
                       # to an extracted path so shared dest dirs don't
                       # cross-satisfy each other's status checks)
    consumer: str = "" # framework command that uses the artifact
    ref: str = ""      # reference file:line this mirrors


ARTIFACTS: tuple = (
    # ---- live gesture paths -------------------------------------------------
    Artifact(
        "zeggs_checkpoint",
        "DiffuseStyleGesture ZEGGS released checkpoint (model000450000.pt, 450k steps)",
        (Source("gdrive", "1RlusxWJFJMyauXdbfbI_XreJwVRnrBv_"),
         Source("manual", "https://cloud.tsinghua.edu.cn/f/8ade7c73e05c4549ac6b/",
                "Tsinghua Cloud mirror — browser download")),
        "zeggs", "model000450000.pt",
        consumer="python -m diffusestylegesture_tpu.cli.convert_ckpt "
                 "--torch artifacts/zeggs/model000450000.pt --family zeggs; "
                 "then scripts/validate_real_ckpt.py",
        ref="README.md:46-47",
    ),
    Artifact(
        "beat_twh_checkpoints",
        "DSG+ released checkpoints (BEAT model001080000.pt, TWH model001200000.pt)",
        (Source("manual", "https://drive.google.com/drive/folders/"
                          "1O5svzmBY8oadTsQdKPj7QyFslxk8uCLk",
                "Google Drive FOLDER — download the two .pt files by browser"),
         Source("manual", "https://pan.baidu.com/s/1YcUIB7Ae6vGAzXnHqWDO8g?pwd=k9i4",
                "Baidu mirror, code k9i4")),
        "beat_twh",
        consumer="python -m diffusestylegesture_tpu.cli.convert_ckpt "
                 "--torch artifacts/beat_twh/model001200000.pt --family twh",
        ref="BEAT-TWH-main/Readme.md:37",
    ),
    Artifact(
        "wavlm_large",
        "Microsoft WavLM-Large pretrained speech encoder (WavLM-Large.pt, ~1.2 GB)",
        (Source("manual", "https://github.com/microsoft/unilm/tree/master/wavlm",
                "follow the 'WavLM Large' link (Azure/GDrive hosted)"),),
        "wavlm", "WavLM-Large.pt",
        consumer="python -m diffusestylegesture_tpu.cli.convert_ckpt "
                 "--torch artifacts/wavlm/WavLM-Large.pt --family wavlm",
        ref="README.md:48; BEAT-TWH-main/Readme.md:96",
    ),
    Artifact(
        "fasttext_crawl_300d",
        "fastText crawl-300d-2M.vec English word vectors (~1.5 GB zip)",
        (Source("http", "https://dl.fbaipublicfiles.com/fasttext/"
                        "vectors-english/crawl-300d-2M.vec.zip"),),
        "fasttext", post="unzip", marker="crawl-300d-2M.vec",
        consumer="diffusestylegesture_tpu.data.text.load_wordvectors("
                 "'artifacts/fasttext/crawl-300d-2M.vec')",
        ref="BEAT-TWH-main/Readme.md:96",
    ),
    Artifact(
        "zeggs_processed_data",
        "ZEGGS dataset preprocessed by ZeroEGGS (processed_v1/trimmed train+test)",
        (Source("manual", "https://cloud.tsinghua.edu.cn/f/ba5f3b33d94b4cba875b/",
                "Tsinghua Cloud"),
         Source("manual", "https://pan.baidu.com/s/1KakkGpRZWfaJzfN5gQvPAw?pwd=vfuc",
                "Baidu mirror, code vfuc"),
         Source("manual", "https://github.com/ubisoft/ubisoft-laforge-ZeroEGGS",
                "or rebuild from the raw ZEGGS release with cli.zeroeggs prepare")),
        "zeggs/processed_v1",
        consumer="python -m diffusestylegesture_tpu.cli.prepare_data "
                 "--dataset zeggs --src artifacts/zeggs/processed_v1/trimmed",
        ref="README.md:71-74",
    ),
    Artifact(
        "beat_dataset",
        "BEAT mocap dataset (GENEA-2023 subset)",
        (Source("manual", "https://github.com/PantoMatrix/BEAT",
                "registration-gated portal"),),
        "beat/source",
        consumer="python -m diffusestylegesture_tpu.cli.prepare_data --dataset beat",
        ref="BEAT-TWH-main/Readme.md:118-128",
    ),
    Artifact(
        "twh_dataset",
        "Talking-With-Hands 16.2M / GENEA 2023 challenge data",
        (Source("manual", "https://github.com/facebookresearch/TalkingWithHands32M",
                "see also https://genea-workshop.github.io/2023/challenge/"),),
        "twh/source",
        consumer="python -m diffusestylegesture_tpu.cli.prepare_data --dataset twh",
        ref="BEAT-TWH-main/Readme.md:144-155",
    ),
    # ---- MDM-legacy eval/train artifacts (prepare/*.sh parity) --------------
    Artifact(
        "glove",
        "GloVe vectors used by the T2M evaluators",
        (Source("gdrive", "1cmXKUT31pqd7_XpJAiWEo1K81TMYHA5n"),),
        "glove", "glove.zip", post="unzip", marker="glove",
        consumer="diffusestylegesture_tpu.data.humanml.WordVectorizer('artifacts/glove')",
        ref="main/prepare/download_glove.sh",
    ),
    Artifact(
        "humanact12_poses",
        "HumanAct12 poses dataset (action-to-motion)",
        (Source("gdrive", "1130gHSvNyJmii7f6pv5aY5IyQIWc3t7R"),),
        "dataset", "HumanAct12Poses.tar.gz", post="untar",
        marker="HumanAct12Poses",
        consumer="python -m diffusestylegesture_tpu.cli.train_t2m --dataset humanact12",
        ref="main/prepare/download_a2m_datasets.sh",
    ),
    Artifact(
        "uestc_poses",
        "UESTC poses estimated with VIBE",
        (Source("gdrive", "1LE-EmYNzECU8o7A2DmqDKtqDMucnSJsy"),),
        "dataset", "uestc.tar.bz2", post="untar", marker="uestc",
        consumer="python -m diffusestylegesture_tpu.cli.train_t2m --dataset uestc",
        ref="main/prepare/download_a2m_datasets.sh",
    ),
    Artifact(
        "recognition_humanact12",
        "HumanAct12 action-recognition eval model",
        (Source("http", "https://raw.githubusercontent.com/EricGuo5513/"
                        "action-to-motion/master/model_file/"
                        "action_recognition_model_humanact12.tar"),),
        "assets/actionrecognition", "humanact12_gru.tar",
        consumer="diffusestylegesture_tpu.eval.action2motion (a2m eval)",
        ref="main/prepare/download_recognition_models.sh",
    ),
    Artifact(
        "recognition_uestc",
        "UESTC action-recognition eval model (STGCN)",
        (Source("gdrive", "1bSSD69s1dHY7Uk0RGbGc6p7uhUxSDSBK"),),
        "assets/actionrecognition", "uestc_stgcn.tar",
        consumer="diffusestylegesture_tpu.eval.stgcn (a2m eval)",
        ref="main/prepare/download_recognition_models.sh",
    ),
    Artifact(
        "recognition_unconstrained",
        "HumanAct12 recognition model adjusted for the unconstrained setting",
        (Source("gdrive", "1xfigimkPxKt3a8zvn_ME_NAR6CyTqneK"),),
        "assets/actionrecognition", "humanact12_gru_unconstrained.tar",
        consumer="diffusestylegesture_tpu.eval.unconstrained (KID/precision-recall)",
        ref="main/prepare/download_recognition_unconstrained_models.sh",
    ),
    Artifact(
        "smpl_files",
        "SMPL body-model files",
        (Source("gdrive", "1INYlGA76ak_cKGzvpOV2Pe6RkYTlXTW2"),),
        "body_models", "smpl.zip", post="unzip", marker="smpl",
        consumer="python -c 'from diffusestylegesture_tpu.models import smpl' "
                 "(+ its pkl->npz converter)",
        ref="main/prepare/download_smpl_files.sh",
    ),
    Artifact(
        "t2m_evaluators",
        "T2M evaluator checkpoints (t2m.zip)",
        (Source("gdrive", "1DSaKqWX2HlwBtVH5l7DdW96jeYUIXsOP"),),
        ".", "t2m.zip", post="unzip", marker="t2m",
        consumer="diffusestylegesture_tpu.eval.t2m_evaluator (converter in module)",
        ref="main/prepare/download_t2m_evaluators.sh",
    ),
    Artifact(
        "kit_evaluators",
        "KIT evaluator checkpoints (kit.zip)",
        (Source("gdrive", "1tX79xk0fflp07EZ660Xz1RAFE33iEyJR"),),
        ".", "kit.zip", post="unzip", marker="kit",
        consumer="diffusestylegesture_tpu.eval.t2m_evaluator",
        ref="main/prepare/download_t2m_evaluators.sh",
    ),
)

BY_NAME = {a.name: a for a in ARTIFACTS}


# --------------------------------------------------------------------------
# Google Drive confirm-token flow (what `gdown` does), stdlib only.
# --------------------------------------------------------------------------
class _GDriveFormParser(html.parser.HTMLParser):
    """Extract the download form action + hidden fields from the
    'can't scan for viruses' interstitial page."""

    def __init__(self):
        super().__init__()
        self.action: Optional[str] = None
        self.fields: dict = {}

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "form" and "download" in (a.get("action") or ""):
            self.action = a["action"]
        if tag == "input" and a.get("type") == "hidden" and a.get("name"):
            self.fields[a["name"]] = a.get("value", "")


def gdrive_confirm_url(page: str) -> Optional[str]:
    """Given the interstitial HTML, return the confirmed download URL."""
    p = _GDriveFormParser()
    p.feed(page)
    if p.action:
        return p.action + "?" + urllib.parse.urlencode(p.fields)
    m = re.search(r"confirm=([0-9A-Za-z_\-]+)", page)
    if m:
        return m.group(0)  # legacy token, caller appends to the uc URL
    return None


def _stream_to(resp, out_path: pathlib.Path, label: str) -> None:
    total = int(resp.headers.get("Content-Length") or 0)
    done = 0
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = out_path.with_suffix(out_path.suffix + ".part")
    with open(tmp, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if total:
                sys.stderr.write(f"\r  {label}: {done / 1e6:.1f}/{total / 1e6:.1f} MB")
            else:
                sys.stderr.write(f"\r  {label}: {done / 1e6:.1f} MB")
    sys.stderr.write("\n")
    tmp.rename(out_path)


def fetch_http(url: str, out_path: pathlib.Path, timeout: float = 60.0) -> None:
    req = urllib.request.Request(url, headers={"User-Agent": "dsg-tpu-fetch/1.0"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        _stream_to(resp, out_path, out_path.name)


def fetch_gdrive(file_id: str, out_path: pathlib.Path, timeout: float = 60.0) -> None:
    url = GDRIVE_FILE.format(id=file_id)
    req = urllib.request.Request(url, headers={"User-Agent": "dsg-tpu-fetch/1.0"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        ctype = resp.headers.get("Content-Type", "")
        if "text/html" not in ctype:
            _stream_to(resp, out_path, out_path.name)
            return
        page = resp.read().decode("utf-8", "replace")
    confirmed = gdrive_confirm_url(page)
    if not confirmed:
        raise RuntimeError(
            f"Google Drive did not offer a direct download for {file_id} "
            "(quota exceeded or permission wall) — use the manual mirror.")
    if confirmed.startswith("confirm="):
        confirmed = url + "&" + confirmed
    req = urllib.request.Request(confirmed, headers={"User-Agent": "dsg-tpu-fetch/1.0"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        # a second HTML page means quota/permission wall — do NOT stream
        # it into the artifact file and call it a download
        if "text/html" in resp.headers.get("Content-Type", ""):
            raise RuntimeError(
                f"Google Drive answered the confirmed URL for {file_id} "
                "with another HTML page (quota exceeded or cookie-gated) "
                "— use the manual mirror.")
        _stream_to(resp, out_path, out_path.name)


def post_extract(archive: pathlib.Path, dest_dir: pathlib.Path, mode: str) -> None:
    if mode == "unzip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(dest_dir)
    elif mode == "untar":
        with tarfile.open(archive) as t:  # auto-detects gz/bz2/xz
            t.extractall(dest_dir, filter="data")
    else:
        raise ValueError(f"unknown post step {mode!r}")
    archive.unlink()


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------
def artifact_status(a: Artifact, dest_root: pathlib.Path) -> str:
    d = dest_root / a.dest
    marker = a.marker or (a.filename if a.post == "" else "")
    if marker:
        return "present" if (d / marker).exists() else "missing"
    # manual multi-file artifacts (datasets): any content in their own dir
    if d.exists() and any(d.iterdir()):
        return "present"
    return "missing"


def fetch_one(a: Artifact, dest_root: pathlib.Path) -> bool:
    d = dest_root / a.dest
    for src in a.sources:
        try:
            if src.kind == "manual":
                print(f"[{a.name}] MANUAL: fetch from {src.url}")
                if src.note:
                    print(f"  note: {src.note}")
                print(f"  place under: {d}/")
                if a.consumer:
                    print(f"  then: {a.consumer}")
                return False
            fname = a.filename or pathlib.Path(
                urllib.parse.urlparse(src.url).path).name or (a.name + ".bin")
            out = d / fname
            if src.kind == "http":
                print(f"[{a.name}] downloading {src.url}")
                fetch_http(src.url, out)
            elif src.kind == "gdrive":
                print(f"[{a.name}] downloading from Google Drive id={src.url}")
                fetch_gdrive(src.url, out)
            else:
                raise ValueError(src.kind)
            if a.post:
                print(f"  extracting ({a.post}) -> {d}/")
                post_extract(out, d, a.post)
            if a.consumer:
                print(f"  next: {a.consumer}")
            return True
        except urllib.error.HTTPError as e:
            # a real HTTP status — the network is fine, the URL is not
            print(f"[{a.name}] HTTP {e.code} {e.reason} from {e.url} — "
                  "the artifact may have moved; try a manual mirror "
                  "(--list).")
        except urllib.error.URLError as e:
            more = "trying next source" if src is not a.sources[-1] else (
                "no route to the host — on a zero-egress machine this is "
                "expected; run on a connected machine or use the manual "
                "mirror(s) listed by --list")
            print(f"[{a.name}] network unavailable ({e.reason}); {more}.")
        except Exception as e:  # quota walls, bad archives, ...
            print(f"[{a.name}] {type(e).__name__}: {e}")
    return False


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dest", type=pathlib.Path, default=DEFAULT_DEST)
    ap.add_argument("--list", action="store_true", help="show the manifest")
    ap.add_argument("--status", action="store_true", help="presence check")
    ap.add_argument("--all", action="store_true", help="fetch everything fetchable")
    ap.add_argument("--fetch", nargs="+", metavar="NAME", default=[])
    args = ap.parse_args(argv)

    if args.list or not (args.status or args.all or args.fetch):
        for a in ARTIFACTS:
            kinds = ",".join(s.kind for s in a.sources)
            print(f"{a.name:28s} [{kinds:13s}] {a.desc}")
            print(f"{'':28s}  -> {args.dest / a.dest}   (ref: {a.ref})")
        return 0
    if args.status:
        missing = 0
        for a in ARTIFACTS:
            st = artifact_status(a, args.dest)
            missing += st == "missing"
            print(f"{a.name:28s} {st}")
        return 1 if missing else 0

    names = [a.name for a in ARTIFACTS] if args.all else args.fetch
    unknown = [n for n in names if n not in BY_NAME]
    if unknown:
        ap.error(f"unknown artifact(s): {unknown}; see --list")
    manual = [n for n in names
              if all(s.kind == "manual" for s in BY_NAME[n].sources)]
    fetchable = [n for n in names if n not in manual]
    ok = sum(fetch_one(BY_NAME[n], args.dest) for n in names)
    print(f"fetched {ok}/{len(fetchable)} downloadable"
          + (f"; {len(manual)} manual artifact(s) listed above" if manual
             else ""))
    return 0 if ok == len(fetchable) else 1


if __name__ == "__main__":
    # behave under `| head` (SIGPIPE default action instead of a traceback)
    import signal
    if hasattr(signal, "SIGPIPE"):
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    raise SystemExit(main())
