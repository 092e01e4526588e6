#!/usr/bin/env python
"""One-time ultralytics `.pt` -> native msgpack converter (CLI).

Works without the ultralytics package installed (permissive unpickling +
structural module-tree walk; see yolo_infer_tpu/models/convert.py).

Usage:
  python tools/convert_pt.py yolo11n.pt              # -> yolo11n.msgpack
  python tools/convert_pt.py yolo11n.pt out.msgpack
"""

import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else None

    from yolo_infer_tpu.models.convert import convert_to_file

    out = convert_to_file(src, dst)
    print(f"converted {src} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
