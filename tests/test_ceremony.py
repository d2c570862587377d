"""Ceremony download + remote setup cache (gh_release.py / cache.py parity).

Zero-egress environment: the GitHub feed and asset transport are injected
(a file:// fetcher over a staged release directory), which is exactly the
transport-abstraction point production uses for the real API.
"""

import json
import os

import pytest

TOY = "/root/reference/prover-service/resources/toy_circuit"


def _file_fetch(url, dest, auth_token=None):
    import shutil

    assert url.startswith("file://")
    shutil.copyfile(url[len("file://"):], dest)


@pytest.fixture
def staged_release(tmp_path):
    """A fake GitHub release whose assets are the reference toy setup."""
    assets_dir = tmp_path / "assets"
    assets_dir.mkdir()
    import shutil

    shutil.copyfile(f"{TOY}/toy_1.zkey", assets_dir / "prover_key.zkey")
    shutil.copyfile(f"{TOY}/toy_vk.json", assets_dir / "verification_key.json")
    (assets_dir / "circuit_config.yaml").write_text("max_lengths: {}\n")
    feed = [
        {
            "tag_name": "ceremony-v1",
            "created_at": "2024-05-01T00:00:00Z",
            "assets": [
                {
                    "name": name,
                    "browser_download_url": f"file://{assets_dir}/{name}",
                    "url": f"file://{assets_dir}/{name}",
                }
                for name in (
                    "prover_key.zkey",
                    "verification_key.json",
                    "circuit_config.yaml",
                )
            ],
        }
    ]
    return feed


def test_download_ceremony_installs_setup(staged_release, tmp_path):
    from keyless_zk_tpu.tooling.ceremony import Releases, download_ceremony

    rel = Releases(feed=staged_release, fetch=_file_fetch)
    assert rel.release_names() == ["ceremony-v1"]
    root = str(tmp_path / "setups")
    path = download_ceremony("ceremony-v1", root=root, releases=rel)
    assert os.path.exists(os.path.join(path, "prover_key.zkey"))
    assert os.path.exists(os.path.join(path, "verification_key.json"))
    assert os.path.exists(os.path.join(path, "circuit_config.yml"))  # renamed
    # `new` slot points at it (staged-rollout layout)
    assert os.path.realpath(os.path.join(root, "new")) == os.path.realpath(path)
    # idempotent: same release installs to the same content key
    assert download_ceremony("ceremony-v1", root=root, releases=rel) == path


def test_download_ceremony_checksum_pinning(staged_release, tmp_path):
    from keyless_zk_tpu.tooling.ceremony import Releases, download_ceremony

    rel = Releases(feed=staged_release, fetch=_file_fetch)
    with pytest.raises(ValueError, match="checksum mismatch"):
        download_ceremony(
            "ceremony-v1",
            root=str(tmp_path / "setups"),
            releases=rel,
            checksums={"prover_key.zkey": "0" * 64},
        )


def test_missing_release_and_asset(staged_release):
    from keyless_zk_tpu.tooling.ceremony import (
        ReleaseMissingRequiredAsset,
        ReleaseNotFound,
        Releases,
    )

    rel = Releases(feed=staged_release, fetch=_file_fetch)
    with pytest.raises(ReleaseNotFound):
        rel.release_with_name("nope")
    with pytest.raises(ReleaseMissingRequiredAsset):
        rel.get_assets("ceremony-v1", ["prover_key.zkey", "wgen_c.zip"])


def test_cache_push_pull_roundtrip(staged_release, tmp_path):
    from keyless_zk_tpu.tooling.ceremony import (
        Releases,
        cache_pull,
        cache_push,
        download_ceremony,
    )

    rel = Releases(feed=staged_release, fetch=_file_fetch)
    root_a = str(tmp_path / "host_a")
    setup = download_ceremony("ceremony-v1", root=root_a, releases=rel)
    key = os.path.basename(setup)

    remote = str(tmp_path / "remote_cache")
    blob = cache_push(setup, remote)
    assert os.path.exists(blob)

    # a second host pulls instead of procuring
    root_b = str(tmp_path / "host_b")
    got = cache_pull(key, remote, root=root_b, slot="default")
    assert got is not None
    assert os.path.exists(os.path.join(got, "prover_key.zkey"))
    assert os.path.realpath(os.path.join(root_b, "default")) == os.path.realpath(got)

    # a miss returns None (caller procures + pushes)
    assert cache_pull("zkey-deadbeef", remote, root=root_b) is None
