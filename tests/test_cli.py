"""CLI argument plumbing tests.

The reference exposes flags on 8 separate scripts; our single CLI shares
`--store_path` / `--image_path` / `--config` between the main parser and
every subparser (cli.py documents both `cli --store_path S all` and
`cli all --store_path S`). argparse re-applies subparser defaults over the
main parser's namespace, so shared flags must carry SUPPRESS defaults —
these tests pin that both orderings survive.
"""

from scanner_colmap_tpu.pipeline.cli import config_from_args, parse_args


def test_shared_flags_before_subcommand():
    args = parse_args(["--store_path", "S", "--image_path", "I", "all"])
    assert args.store_path == "S"
    assert args.image_path == "I"


def test_shared_flags_after_subcommand():
    args = parse_args(["all", "--store_path", "S", "--image_path", "I"])
    assert args.store_path == "S"
    assert args.image_path == "I"


def test_shared_flag_defaults_fill_in():
    args = parse_args(["extraction"])
    assert args.store_path is None
    assert args.image_path is None
    assert args.config is None
    assert args.verbose is False


def test_verbose_before_subcommand():
    args = parse_args(["-v", "all"])
    assert args.verbose is True


def test_stage_knobs_reach_config():
    args = parse_args(["--store_path", "S", "all", "--overlap", "7",
                       "--cluster_size", "12", "--cluster_overlap", "3"])
    cfg = config_from_args(args)
    assert cfg.store_path == "S"
    assert cfg.matching.overlap == 7
    assert cfg.mapper.cluster_size == 12
    assert cfg.mapper.cluster_overlap == 3
