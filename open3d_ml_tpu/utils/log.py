"""Logging helpers: {}-style LogRecord, run-id allocator, code->markdown.

Rebuild of /root/reference/ml3d/utils/log.py:6-42.
"""

import logging
import re
from os import listdir
from os.path import exists, isdir, join


class LogRecord(logging.LogRecord):
    """LogRecord that formats messages with str.format ({}-style)."""

    def getMessage(self):
        msg = self.msg
        if self.args:
            if isinstance(self.args, dict):
                msg = msg.format(**self.args)
            else:
                msg = msg.format(*self.args)
        return msg


def get_runid(path):
    """Allocate the next 5-digit run id for a log directory.

    Scans sibling entries named '<NNNNN>_*' and returns max+1 zero-padded.
    """
    name = path.split("/")[-1]
    parent = path[:-len(name)] or "."
    if not exists(parent):
        return "00001"
    files = listdir(parent)
    runid = 0
    for f in files:
        try:
            id, val = f.split("_", 1)
        except ValueError:
            continue
        if val == name and id.isdigit():
            runid = max(runid, int(id))
    return str(runid + 1).zfill(5)


def code2md(code_text, language="python"):
    """Wrap source code in a markdown code block (for TensorBoard text)."""
    return f"```{language}\n{code_text}\n```"
