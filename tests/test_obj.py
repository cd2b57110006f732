"""OBJ prism writer tests (reference semantics: tmc3/my_function.cpp:63-126)."""

import numpy as np

from buildingsegment_tpu.io.obj import prism_obj_text, write_prism_obj


def test_single_square_contour():
    contour = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    text = prism_obj_text([contour], image_width=20, image_height=20)
    lines = text.splitlines()
    verts = [l for l in lines if l.startswith("v ")]
    faces = [l for l in lines if l.startswith("f ")]
    # two vertices (z=0, z=h) per contour point
    assert len(verts) == 8
    # one side-wall quad per edge, no caps (my_function.cpp:109-126)
    assert len(faces) == 4
    # y flipped: pixel y=0 → 1.0
    assert verts[0] == "v 0 1 0.0"
    # indices are 1-based, quad = bottom1 bottom2 top2 top1
    assert faces[0] == "f 1 3 4 2"


def test_normalization_to_unit_square():
    contour = np.array([[50, 25]])
    text = prism_obj_text([contour], image_width=100, image_height=100)
    assert "v 0.5 0.75 0.0" in text


def test_all_contours_extruded():
    # the reference extrudes ALL contours, callers decide what to pass
    c1 = np.array([[0, 0], [5, 0], [5, 5]])
    c2 = np.array([[8, 8], [9, 8], [9, 9]])
    text = prism_obj_text([c1, c2], image_width=10, image_height=10)
    assert text.count("\nf ") == 6  # 3 edges each
    assert "# contour count: 2" in text


def test_file_write(tmp_path):
    p = str(tmp_path / "prisms.obj")
    write_prism_obj(p, [np.array([[1, 1], [2, 1], [2, 2]])], 4, 4, height=2.5)
    content = open(p).read()
    assert "v 0.5 0.5 2.5" in content  # top ring at custom height
