"""Tooling tests: on-chain VK encoding, vk-diff, release-helper, zkey
round-trip, span logging."""

import io
import json
import os

import numpy as np
import pytest

TOY = "/root/reference/prover-service/resources/toy_circuit/"
needs_toy = pytest.mark.skipif(
    not os.path.isdir(TOY), reason="reference toy artifacts unavailable"
)


def test_onchain_g2_generator_matches_reference_example():
    """The on-chain gamma_g2 hex from the reference docs
    (keyless-common/src/types.rs:43-60) is the compressed G2 generator."""
    from keyless_zk_tpu.fields import bn254
    from keyless_zk_tpu.tooling.onchain_vk import compress_g2, decompress_g2

    gen = (bn254.G2_GENERATOR_X, bn254.G2_GENERATOR_Y)
    expected = (
        "edf692d95cbdde46ddda5ef7d422436779445c5e66006a42761e1f12efde0018"
        "c212f3aeb785e49712e7a9353349aaf1255dfb31b7bf60723a480d9293938e19"
    )
    assert compress_g2(gen).hex() == expected
    assert decompress_g2(bytes.fromhex(expected)) == gen


def test_g1_compress_roundtrip():
    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.tooling.onchain_vk import compress_g1, decompress_g1

    for k in (1, 2, 12345, 2**200 + 7):
        pt = ref_curve.G1.mul(ref_curve.G1_GEN, k)
        assert decompress_g1(compress_g1(pt)) == pt
    inf = compress_g1(None)
    assert decompress_g1(inf) is None


def test_g2_compress_roundtrip():
    from keyless_zk_tpu.curves import ref_curve
    from keyless_zk_tpu.tooling.onchain_vk import compress_g2, decompress_g2

    for k in (1, 5, 987654321):
        pt = ref_curve.G2.mul(ref_curve.G2_GEN, k)
        assert decompress_g2(compress_g2(pt)) == pt


@needs_toy
def test_vk_diff_self_match_and_mismatch():
    from keyless_zk_tpu.tooling.onchain_vk import snarkjs_vk_to_onchain
    from keyless_zk_tpu.tooling.vk_diff import diff_vks

    vk = json.load(open(TOY + "toy_vk.json"))
    onchain = snarkjs_vk_to_onchain(vk)
    assert diff_vks(vk, onchain) == []
    # mutated on-chain VK -> mismatch reported
    bad = json.loads(json.dumps(onchain))
    bad["data"]["alpha_g1"] = "0x" + "00" * 32
    assert any("alpha_g1" in d for d in diff_vks(vk, bad))


@needs_toy
def test_release_helper_script(tmp_path):
    from keyless_zk_tpu.tooling.release_helper import main

    twpk = tmp_path / "twpk.hex"
    twpk.write_text("0x" + "ab" * 32)
    out = tmp_path / "script.move"
    rc = main(
        [
            "generate-root-signer-script",
            "--vk-path", TOY + "toy_vk.json",
            "--twpk-path", str(twpk),
            "--out", str(out),
        ]
    )
    assert rc == 0
    content = out.read_text()
    assert "keyless_account::new_groth16_verification_key" in content
    assert 'x"' + "ab" * 32 + '"' in content
    assert "get_signer_testnet_only" in content


@needs_toy
def test_zkey_save_load_roundtrip(tmp_path):
    from keyless_zk_tpu.groth16 import load_zkey
    from keyless_zk_tpu.groth16.zkey import save_zkey

    pk = load_zkey(TOY + "toy_1.zkey")
    path = str(tmp_path / "rt.zkey")
    save_zkey(path, pk)
    pk2 = load_zkey(path)
    assert (pk2.n_vars, pk2.n_public, pk2.domain_size, pk2.n_coefs) == (
        pk.n_vars, pk.n_public, pk.domain_size, pk.n_coefs,
    )
    assert pk2.vk_alpha1 == pk.vk_alpha1 and pk2.vk_delta2 == pk.vk_delta2
    assert np.array_equal(pk2.coef_val, pk.coef_val)
    assert np.array_equal(pk2.coef_m, pk.coef_m)
    for a, b in ((pk2.points_a, pk.points_a), (pk2.points_h, pk.points_h)):
        assert np.array_equal(a.x, b.x) and np.array_equal(a.inf, b.inf)
    assert np.array_equal(pk2.points_b2.x, pk.points_b2.x)


def test_span_logging():
    import sys

    from keyless_zk_tpu.utils.logging import Span, log_event, with_context

    buf = io.StringIO()
    with with_context(session_id="abc123"):
        log_event("hello", stream=buf)
    line = json.loads(buf.getvalue())
    assert line["message"] == "hello" and line["session_id"] == "abc123"

    # Span writes to stderr; just exercise enter/exit paths
    with Span("TestSpan", request="r1"):
        pass


def test_setup_tool_checksum_stability():
    from keyless_zk_tpu.circuits.keyless_circuit import KeylessConfig
    from keyless_zk_tpu.tooling.setup_tool import circuit_checksum

    a = circuit_checksum(KeylessConfig())
    b = circuit_checksum(KeylessConfig())
    assert a == b
    c = circuit_checksum(KeylessConfig(max_aud_value_len=119))
    assert c != a


def test_import_zkey_and_slots(tmp_path):
    """import-zkey installs a snarkjs zkey content-addressed, recovers the
    VK from the zkey's own IC points, and manages default/new slots
    (gh_release.py / setups/__init__.py:10-28 parity)."""
    import json
    import os

    from keyless_zk_tpu.tooling.setup_tool import import_zkey, set_slot

    TOY = "/root/reference/prover-service/resources/toy_circuit"
    root = str(tmp_path / "setups")
    os.makedirs(root)
    target = import_zkey(f"{TOY}/toy_1.zkey", root=root, slot="new")
    assert os.path.exists(os.path.join(target, ".complete"))
    assert os.readlink(os.path.join(root, "new")) == os.path.basename(target)
    # device-format table cache built eagerly
    assert os.path.exists(os.path.join(target, "prover_key.zkey.tables.npz"))

    # the recovered VK must match the snarkjs-exported one point-for-point
    got = json.load(open(os.path.join(target, "verification_key.json")))
    want = json.load(open(f"{TOY}/toy_vk.json"))
    for k in ("vk_alpha_1", "vk_beta_2", "vk_gamma_2", "vk_delta_2", "IC"):
        assert got[k] == want[k], k
    assert got["nPublic"] == want["nPublic"]

    set_slot(root, os.path.basename(target), "default")
    assert os.readlink(os.path.join(root, "default")) == os.path.basename(target)
    # re-import is idempotent
    assert import_zkey(f"{TOY}/toy_1.zkey", root=root) == target


def test_zkey_table_cache_roundtrip(tmp_path):
    """The .tables.npz cache must reproduce the parsed ProvingKey exactly."""
    import shutil

    import numpy as np

    from keyless_zk_tpu.groth16.zkey import load_zkey

    TOY = "/root/reference/prover-service/resources/toy_circuit"
    zk = str(tmp_path / "toy.zkey")
    shutil.copyfile(f"{TOY}/toy_1.zkey", zk)
    fresh = load_zkey(zk, cache=True)  # writes the cache
    cached = load_zkey(zk, cache=True)  # reads it back
    assert cached.vk_alpha1 == fresh.vk_alpha1
    assert cached.vk_ic == fresh.vk_ic
    assert cached.q == fresh.q and cached.r == fresh.r
    assert np.array_equal(cached.points_a.x, fresh.points_a.x)
    assert np.array_equal(cached.points_b2.y, fresh.points_b2.y)
    assert np.array_equal(cached.coef_val, fresh.coef_val)
    assert cached.n_coefs == fresh.n_coefs


def test_zkey_cache_never_writes_foreign_dirs(tmp_path, monkeypatch):
    """Zkeys loaded from directories we don't own (vendored fixtures,
    read-only setup images) must not get a cache file written beside them —
    the cache goes to ~/.cache/keyless_zk_tpu/zkey_tables instead."""
    import os

    from keyless_zk_tpu.groth16.zkey import load_zkey, zkey_table_cache_path

    TOY = "/root/reference/prover-service/resources/toy_circuit/toy_1.zkey"
    before = set(os.listdir(os.path.dirname(TOY)))
    cache_file = zkey_table_cache_path(TOY)
    assert not cache_file.startswith(os.path.dirname(TOY))
    if os.path.exists(cache_file):
        os.unlink(cache_file)
    load_zkey(TOY, cache=True)
    assert set(os.listdir(os.path.dirname(TOY))) == before
    assert os.path.exists(cache_file)

    # the setup store itself stays self-contained (beside-file cache)
    store = os.path.join(
        os.path.expanduser("~"), ".local", "share", "keyless_zk_tpu", "s", "k.zkey"
    )
    assert zkey_table_cache_path(store) == store + ".tables.npz"


PROD_VK = "/root/reference/prover-service/resources/202405_vk.vkey"


@pytest.mark.skipif(
    not os.path.exists(PROD_VK), reason="production VK sample unavailable"
)
def test_production_vk_converts_and_roundtrips():
    """The May-2024 production VK sample (the reference ships it at
    prover-service/resources/202405_vk.vkey; its converters are exercised
    against on-chain data in vk-diff/src/main.rs:121-142) must convert to
    the pinned on-chain compressed encoding, decompress back to the same
    affine points, and pass vk_diff against itself."""
    from keyless_zk_tpu.tooling.onchain_vk import (
        decompress_g1,
        decompress_g2,
        snarkjs_vk_to_onchain,
    )
    from keyless_zk_tpu.tooling.vk_diff import diff_vks

    vk = json.load(open(PROD_VK))
    data = snarkjs_vk_to_onchain(vk)["data"]

    # pinned conversion of the real production sample (ark-serialize
    # compressed hex, snark_js_groth16.rs:63-106 semantics)
    assert data["alpha_g1"] == (
        "0xe2f26dbea299f5223b646cb1fb33eadb059d9407559d7441dfd902e3a79a4d2d"
    )
    assert data["beta_g2"] == (
        "0xabb73dc17fbc13021e2471e0c08bd67d8401f52b73d6d07483794cad4778180e"
        "0c06f33bbc4c79a9cadef253a68084d382f17788f885c9afd176f7cb2f036789"
    )
    assert data["delta_g2"] == (
        "0x6176de7d77e614e09ef5e8e19cbf785ffed405d6531cee13cd71a46e2b4ef30d"
        "eb18f6976c172bdcd7ea8ab2b509991bb5ce34f9fbb42486b78aac62a894a480"
    )
    assert data["gamma_abc_g1"] == [
        "0x7e92d0c6818f2e51248cd1e8e82eb14521d990b0bb155ab0e3cf99b888bc5387",
        "0xbe1ad9f5fec081770956f846e1d0ea97219a3f6499acc33e1a67aef6d6e16898",
    ]
    # gamma_g2 is the standard G2 generator — same bytes as the on-chain
    # example pinned in keyless-common types.rs:43-60
    assert data["gamma_g2"] == (
        "0xedf692d95cbdde46ddda5ef7d422436779445c5e66006a42761e1f12efde0018"
        "c212f3aeb785e49712e7a9353349aaf1255dfb31b7bf60723a480d9293938e19"
    )

    # decompress round-trip: every point returns to the sample's affines
    a = decompress_g1(bytes.fromhex(data["alpha_g1"][2:]))
    assert a == (int(vk["vk_alpha_1"][0]), int(vk["vk_alpha_1"][1]))
    for key, src in (("beta_g2", "vk_beta_2"), ("delta_g2", "vk_delta_2"),
                     ("gamma_g2", "vk_gamma_2")):
        x, y = decompress_g2(bytes.fromhex(data[key][2:]))
        assert x == (int(vk[src][0][0]), int(vk[src][0][1]))
        assert y == (int(vk[src][1][0]), int(vk[src][1][1]))
    for i in range(2):
        x, y = decompress_g1(bytes.fromhex(data["gamma_abc_g1"][i][2:]))
        assert (x, y) == (int(vk["IC"][i][0]), int(vk["IC"][i][1]))

    # vk_diff: self-match is clean; a perturbed on-chain copy is flagged
    assert diff_vks(vk, {"data": data}) == []
    bad = dict(data)
    bad["delta_g2"] = data["beta_g2"]
    assert any("delta_g2" in d for d in diff_vks(vk, {"data": bad}))


@pytest.mark.skipif(
    not os.path.exists(PROD_VK), reason="production VK sample unavailable"
)
def test_vk_diff_cli_on_production_sample(tmp_path, capsys):
    """vk-diff CLI end-to-end on the production sample (match -> rc 0,
    mismatch -> rc 1, mirroring vk-diff/src/main.rs exit semantics)."""
    from keyless_zk_tpu.tooling.onchain_vk import snarkjs_vk_to_onchain
    from keyless_zk_tpu.tooling.vk_diff import main as vk_diff_main

    onchain = snarkjs_vk_to_onchain(json.load(open(PROD_VK)))
    ok_path = tmp_path / "onchain.json"
    ok_path.write_text(json.dumps(onchain))
    assert vk_diff_main(["--json", PROD_VK, "--onchain-file", str(ok_path)]) == 0

    bad = json.loads(ok_path.read_text())
    bad["data"]["alpha_g1"] = "0x" + "00" * 32
    bad_path = tmp_path / "bad.json"
    bad_path.write_text(json.dumps(bad))
    assert vk_diff_main(["--json", PROD_VK, "--onchain-file", str(bad_path)]) == 1
