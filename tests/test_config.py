from hinge_tpu.config import Config, IniReader, nominal_config


def test_nominal_values():
    c = nominal_config()
    # trailing ';' tolerated by strtol semantics (INIReader.cpp:31-39)
    assert c.filter.length_threshold == 1000
    assert c.filter.quality_threshold == 0.23
    assert c.filter.aln_threshold == 1000
    assert c.filter.min_cov == 5
    assert c.filter.cut_off == 300
    assert c.filter.theta == 300
    assert c.draft.tspace == 900
    assert c.consensus.min_length == 4000
    assert c.layout.hinge_slack == 1000
    assert c.layout.min_connected_component_size == 8


def test_boolean_with_trailing_semicolon_falls_back_to_default():
    # GetBoolean does exact match => "true;" -> default (INIReader.cpp:50-61)
    r = IniReader("[filter]\nuse_qv = true;\ncoverage = false\n", is_text=True)
    assert r.get_boolean("filter", "use_qv", True) is True
    assert r.get_boolean("filter", "use_qv", False) is False  # fell back
    assert r.get_boolean("filter", "coverage", True) is False


def test_defaults_match_reference_call_sites():
    c = Config.from_ini("", is_text=True)
    assert c.filter.hinge_min_support == 7
    assert c.filter.hinge_unbridged == 6
    assert c.filter.hinge_bin == 200  # 2 * hinge_tolerance_length
    assert c.layout.hinge_tolerance == 150
    assert c.layout.kill_hinge_overlap == 300
    assert c.layout.kill_hinge_internal == 40
    assert c.layout.max_plasmid_length == 500000


def test_inline_comment_needs_whitespace():
    r = IniReader("[s]\na = 10 ; comment\nb = 10;nocomment\n", is_text=True)
    assert r.get("s", "a") == "10"
    assert r.get("s", "b") == "10;nocomment"
    assert r.get_integer("s", "b", -1) == 10
