"""YAML pipeline config loading — mirrors
/root/reference/internal/config/yaml_config_parser.go:15-56: reads a file (or
URL) and expands ``$ENV`` / ``${ENV}`` variables before parsing.
"""

from __future__ import annotations

import os

import yaml


def load_config(path_or_str: str, is_text: bool = False) -> dict:
    if is_text:
        text = path_or_str
    elif path_or_str.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(path_or_str, timeout=30) as resp:
            text = resp.read().decode()
    else:
        with open(path_or_str) as f:
            text = f.read()
    text = os.path.expandvars(text)  # $ENV expansion (yaml_config_parser.go:48)
    conf = yaml.safe_load(text)
    if not isinstance(conf, dict):
        raise ValueError("pipeline config must be a mapping")
    return conf
