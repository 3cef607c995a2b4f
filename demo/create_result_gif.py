"""Stitch result images into an animated GIF (reference
`demo/create_result_gif.py`).

Input: a directory of visualization panels written by
`tools/analysis_tools/analyze_results.py` (or any directory of images);
output: one animated GIF cycling through them. The reference builds frames
with matplotlib + imageio; Pillow writes animated GIFs natively, so this
needs no optional deps.

Usage:
    python demo/create_result_gif.py <image_dir> --out result.gif
"""
import argparse
import os

import numpy as np
from PIL import Image

IMG_EXTS = ('.png', '.jpg', '.jpeg', '.bmp')


def load_frames(image_dir: str, max_size: int = 800):
    """Load all images in `image_dir` (sorted), downscaled to a common
    canvas so the GIF palette/geometry is consistent."""
    names = sorted(n for n in os.listdir(image_dir)
                   if n.lower().endswith(IMG_EXTS))
    if not names:
        raise FileNotFoundError(f'no images found under {image_dir}')
    frames = []
    for n in names:
        im = Image.open(os.path.join(image_dir, n)).convert('RGB')
        if max(im.size) > max_size:
            s = max_size / max(im.size)
            im = im.resize((int(im.width * s), int(im.height * s)))
        frames.append(im)
    # pad everything to the largest frame so PIL does not crop
    w = max(f.width for f in frames)
    h = max(f.height for f in frames)
    padded = []
    for f in frames:
        canvas = Image.new('RGB', (w, h), (255, 255, 255))
        canvas.paste(f, ((w - f.width) // 2, (h - f.height) // 2))
        padded.append(canvas)
    return padded


def create_gif(frames, gif_name: str, duration: float = 2.0):
    """Write an animated GIF; `duration` is seconds per frame (the
    reference's imageio convention)."""
    frames[0].save(gif_name, save_all=True, append_images=frames[1:],
                   duration=int(duration * 1000), loop=0)


def main():
    parser = argparse.ArgumentParser(description='Create GIF for demo')
    parser.add_argument('image_dir',
                        help='directory of result images (e.g. written by '
                             'analyze_results.py)')
    parser.add_argument('--out', type=str, default='result.gif')
    parser.add_argument('--duration', type=float, default=2.0,
                        help='seconds per frame')
    args = parser.parse_args()
    frames = load_frames(args.image_dir)
    create_gif(frames, args.out, args.duration)
    print(f'wrote {args.out} ({len(frames)} frames, '
          f'{os.path.getsize(args.out)} bytes)')


if __name__ == '__main__':
    main()
