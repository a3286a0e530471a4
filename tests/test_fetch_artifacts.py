"""Offline tests for scripts/fetch_artifacts.py — the TPU repo's
equivalent of the reference's `main/prepare/download_*.sh` suite.
Network paths are exercised against a loopback HTTP server; the Google
Drive interstitial parser against canned HTML."""
import http.server
import io
import pathlib
import sys
import tarfile
import threading
import zipfile

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))
import fetch_artifacts as FA  # noqa: E402


class TestManifest:
    def test_names_unique_and_wellformed(self):
        names = [a.name for a in FA.ARTIFACTS]
        assert len(names) == len(set(names))
        for a in FA.ARTIFACTS:
            assert a.sources, a.name
            for s in a.sources:
                assert s.kind in ("http", "gdrive", "manual"), (a.name, s.kind)
                assert s.url
            assert a.ref, f"{a.name} must cite the reference script/readme"
            assert a.post in ("", "unzip", "untar")

    def test_covers_every_reference_prepare_script(self):
        """Each of the 7 prepare/*.sh roles + the 7 README artifacts."""
        names = {a.name for a in FA.ARTIFACTS}
        for required in (
            "glove", "humanact12_poses", "uestc_poses", "recognition_humanact12",
            "recognition_uestc", "recognition_unconstrained", "smpl_files",
            "t2m_evaluators", "kit_evaluators",
            "zeggs_checkpoint", "beat_twh_checkpoints", "wavlm_large",
            "fasttext_crawl_300d", "zeggs_processed_data", "beat_dataset",
            "twh_dataset",
        ):
            assert required in names

    def test_live_path_artifacts_name_their_converter(self):
        for n in ("zeggs_checkpoint", "beat_twh_checkpoints", "wavlm_large"):
            assert "convert_ckpt" in FA.BY_NAME[n].consumer


class TestGDriveParser:
    FORM_PAGE = (
        '<html><body><form id="download-form" '
        'action="https://drive.usercontent.google.com/download" method="get">'
        '<input type="hidden" name="id" value="FILEID">'
        '<input type="hidden" name="confirm" value="t">'
        '<input type="hidden" name="uuid" value="abc-123">'
        "<input type='submit'></form></body></html>"
    )
    LEGACY_PAGE = '<a href="/uc?export=download&confirm=NoTaRealToken1&id=X">ok</a>'

    def test_form_interstitial(self):
        url = FA.gdrive_confirm_url(self.FORM_PAGE)
        assert url.startswith("https://drive.usercontent.google.com/download?")
        assert "confirm=t" in url and "uuid=abc-123" in url and "id=FILEID" in url

    def test_legacy_confirm_token(self):
        tok = FA.gdrive_confirm_url(self.LEGACY_PAGE)
        assert tok == "confirm=NoTaRealToken1"

    def test_no_token_returns_none(self):
        assert FA.gdrive_confirm_url("<html>quota exceeded</html>") is None


@pytest.fixture()
def loopback_server(tmp_path):
    """Serve tmp_path over HTTP on an ephemeral loopback port."""
    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **k)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", tmp_path
    srv.shutdown()


class TestDownloadAndExtract:
    def test_http_fetch_roundtrip(self, loopback_server, tmp_path):
        base, docroot = loopback_server
        (docroot / "blob.bin").write_bytes(b"x" * 4096)
        out = tmp_path / "out" / "blob.bin"
        FA.fetch_http(f"{base}/blob.bin", out)
        assert out.read_bytes() == b"x" * 4096
        assert not out.with_suffix(".bin.part").exists()

    def test_unzip_post(self, loopback_server, tmp_path):
        base, docroot = loopback_server
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("inner/hello.txt", "hi")
        (docroot / "a.zip").write_bytes(buf.getvalue())
        dest = tmp_path / "dest"
        archive = dest / "a.zip"
        FA.fetch_http(f"{base}/a.zip", archive)
        FA.post_extract(archive, dest, "unzip")
        assert (dest / "inner" / "hello.txt").read_text() == "hi"
        assert not archive.exists()

    def test_untar_post(self, loopback_server, tmp_path):
        base, docroot = loopback_server
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as t:
            data = b"payload"
            info = tarfile.TarInfo("d/f.bin")
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
        (docroot / "a.tar.gz").write_bytes(buf.getvalue())
        dest = tmp_path / "dest"
        archive = dest / "a.tar.gz"
        FA.fetch_http(f"{base}/a.tar.gz", archive)
        FA.post_extract(archive, dest, "untar")
        assert (dest / "d" / "f.bin").read_bytes() == b"payload"

    def test_fetch_one_end_to_end_with_manifest_shape(self, loopback_server, tmp_path):
        base, docroot = loopback_server
        (docroot / "m.tar").write_bytes(b"not-extracted-no-post" * 10)
        art = FA.Artifact(
            "tiny", "test artifact",
            (FA.Source("http", f"{base}/m.tar"),),
            "assets/tiny", "m.tar", ref="test")
        assert FA.fetch_one(art, tmp_path) is True
        assert (tmp_path / "assets/tiny/m.tar").exists()
        assert FA.artifact_status(art, tmp_path) == "present"

    def test_manual_source_prints_and_returns_false(self, tmp_path, capsys):
        art = FA.BY_NAME["wavlm_large"]
        assert FA.fetch_one(art, tmp_path) is False
        out = capsys.readouterr().out
        assert "MANUAL" in out and "WavLM" in art.desc

    def test_unknown_scheme_falls_through_gracefully(self, tmp_path):
        art = FA.Artifact(
            "dead", "unreachable",
            (FA.Source("http", "http://127.0.0.1:1/nope"),),
            "x", "n.bin", ref="test")
        assert FA.fetch_one(art, tmp_path) is False


class TestCLI:
    def test_list_offline(self, capsys):
        assert FA.main(["--list"]) == 0
        out = capsys.readouterr().out
        assert "zeggs_checkpoint" in out and "glove" in out

    def test_status_offline(self, tmp_path, capsys):
        rc = FA.main(["--status", "--dest", str(tmp_path)])
        assert rc == 1  # everything missing in an empty dest
        assert "missing" in capsys.readouterr().out

    def test_unknown_fetch_name_errors(self, tmp_path):
        with pytest.raises(SystemExit):
            FA.main(["--fetch", "not_a_thing", "--dest", str(tmp_path)])
