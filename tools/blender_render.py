"""Headless Blender EEVEE renderer for exported obj frame sequences.

Reference: /root/reference/tool-blender/render.py — loads obj frames as a
shape-key animation and renders H.264.  Run inside Blender:

    blender --background --python tools/blender_render.py -- \
        --frames_dir evaluate_results/clip --out clip.mp4 --fps 60

Gated: prints a clear message when bpy is unavailable (Blender is not part
of this image; the script ships for users with a Blender install).
"""

import argparse
import os
import sys


def main():
    try:
        import bpy
    except ImportError:
        print("blender_render.py must run inside Blender (bpy not available)")
        sys.exit(2)

    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--resolution", type=int, default=1024)
    args = parser.parse_args(argv)

    objs = sorted(f for f in os.listdir(args.frames_dir) if f.endswith(".obj"))
    assert objs, f"no obj frames in {args.frames_dir}"

    # fresh scene
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.engine = "BLENDER_EEVEE_NEXT" if hasattr(
        bpy.types, "SceneEEVEE") else "BLENDER_EEVEE"
    scene.render.fps = args.fps
    scene.render.resolution_x = scene.render.resolution_y = args.resolution
    scene.render.image_settings.file_format = "FFMPEG"
    scene.render.ffmpeg.format = "MPEG4"
    scene.render.ffmpeg.codec = "H264"
    scene.render.filepath = args.out

    # base mesh from the first frame; the rest become shape keys
    bpy.ops.wm.obj_import(filepath=os.path.join(args.frames_dir, objs[0]))
    base = bpy.context.selected_objects[0]
    base.shape_key_add(name="Basis")
    for i, name in enumerate(objs[1:], start=1):
        bpy.ops.wm.obj_import(filepath=os.path.join(args.frames_dir, name))
        frame_obj = bpy.context.selected_objects[0]
        key = base.shape_key_add(name=f"f{i:06d}")
        for v, kv in zip(frame_obj.data.vertices, key.data):
            kv.co = v.co
        bpy.data.objects.remove(frame_obj, do_unlink=True)
        key.value = 0.0
        key.keyframe_insert("value", frame=i - 1)
        key.value = 1.0
        key.keyframe_insert("value", frame=i)
        key.value = 0.0
        key.keyframe_insert("value", frame=i + 1)

    # camera + light
    cam_data = bpy.data.cameras.new("cam")
    cam = bpy.data.objects.new("cam", cam_data)
    scene.collection.objects.link(cam)
    cam.location = (0, -0.6, 0.05)
    cam.rotation_euler = (1.5708, 0, 0)
    scene.camera = cam
    light_data = bpy.data.lights.new("sun", type="SUN")
    light = bpy.data.objects.new("sun", light_data)
    scene.collection.objects.link(light)
    light.rotation_euler = (0.6, 0.2, 0)

    scene.frame_start = 0
    scene.frame_end = len(objs) - 1
    bpy.ops.render.render(animation=True)
    print(f"rendered {len(objs)} frames → {args.out}")


if __name__ == "__main__":
    main()
