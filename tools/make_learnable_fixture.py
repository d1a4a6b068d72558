"""Learnable fixture: bright rectangles on dark water-ish background; boxes,
semantic mask, and waterline aligned with the structure."""
import numpy as np, os, sys
from PIL import Image
root = sys.argv[1]
rng = np.random.RandomState(7)
for d in ("images", "semantic", "waterline", "radar"):
    os.makedirs(f"{root}/{d}", exist_ok=True)
lines = []
H, W = 1080, 1920
for i in range(8):
    img = np.full((H, W, 3), 40, np.uint8)
    img[H//2:] = (30, 60, 90)                      # "water" lower half
    sem = np.zeros((H, W), np.uint8)
    sem[H//2:] = 8                                  # drivable water = class 8
    wl = np.zeros((H, W), np.uint8)
    wl[H//2-8:H//2+8] = 1                           # waterline band
    boxes = []
    for _ in range(rng.randint(2, 4)):
        cls = rng.randint(0, 3)
        w, h = rng.randint(150, 350), rng.randint(100, 250)
        x1, y1 = rng.randint(0, W - w), rng.randint(0, H - h)
        color = [(255, 80, 80), (80, 255, 80), (80, 80, 255)][cls]
        img[y1:y1+h, x1:x1+w] = color
        sem[y1:y1+h, x1:x1+w] = cls + 1
        boxes.append(f"{x1},{y1},{x1+w},{y1+h},{cls}")
    img += rng.randint(0, 15, img.shape).astype(np.uint8)
    Image.fromarray(img).save(f"{root}/images/s{i}.jpg")
    Image.fromarray(sem).save(f"{root}/semantic/s{i}.png")
    Image.fromarray(wl).save(f"{root}/waterline/s{i}.png")
    with open(f"{root}/radar/s{i}.csv", "w") as f:
        f.write("x,y,z,comp_velocity,rcs,range,doppler,u,v,label\n")
        for b in boxes:                             # radar points on objects
            x1, y1, x2, y2, c = map(int, b.split(","))
            for _ in range(12):
                u, v = rng.uniform(x1, x2), rng.uniform(y1, y2)
                f.write(",".join(map(str, rng.uniform(1, 10, 7))) + f",{u},{v},{int(c)}\n")
    lines.append(f"{root}/images/s{i}.jpg " + " ".join(boxes))
open(f"{root}/train.txt", "w").write("\n".join(lines))
open(f"{root}/val.txt", "w").write("\n".join(lines))
print("learnable fixture:", root)
