"""Host Vector/Matrix math lib parity (ref: src/utils/matrix.js)."""
import numpy as np
import pytest

from sail_tpu import Matrix, Vector


class TestVector:
    def test_accessors_one_based(self):
        v = Vector([1.0, 2.0, 3.0])
        assert v.e(1) == 1.0 and v.e(3) == 3.0
        assert v.e(0) is None and v.e(4) is None
        assert (v.x, v.y, v.z) == (1.0, 2.0, 3.0)
        assert v.dimensions() == 3

    def test_algebra(self):
        a, b = Vector([1, 2, 2]), Vector([3, 0, 4])
        assert a.modulus() == 3.0
        assert a.length() == 3.0
        assert a.dot(b) == 11.0
        assert a.add(b).eql(Vector([4, 2, 6]))
        assert a.subtract(b).eql(Vector([-2, 2, -2]))
        assert a.multiply(2).eql(Vector([2, 4, 4]))
        assert a.divide(2).eql(Vector([0.5, 1, 1]))
        assert (a + b).eql(Vector([4, 2, 6]))
        assert Vector([1, 0, 0]).cross([0, 1, 0]).eql(Vector([0, 0, 1]))
        assert a.toUnitVector().modulus() == pytest.approx(1.0)
        assert Vector([1, 0]).angleFrom(Vector([0, 1])) == pytest.approx(
            np.pi / 2)
        assert b.distanceFrom(Vector([3, 0, 0])) == pytest.approx(4.0)

    def test_component_helpers(self):
        v = Vector([2.0, -1.0, 4.0])
        assert v.maxComponent() == 4.0
        assert v.minComponent() == -1.0
        assert v.componentDivide(Vector([2, 1, 4])).eql(Vector([1, -1, 1]))
        assert v.componentDivide(Vector([1, 2])) is None
        assert Vector([2, 4, 6, 2]).divideByW().eql(Vector([1, 2, 3, 1]))
        assert Vector.min([1, 5, 3], [2, 2, 2]).eql(Vector([1, 2, 2]))
        assert Vector.max([1, 5, 3], [2, 2, 2]).eql(Vector([2, 5, 3]))
        assert Vector.Zero(4).eql(Vector([0, 0, 0, 0]))

    def test_map_dup(self):
        v = Vector([1, 2, 3])
        d = v.dup()
        d.elements[0] = 9
        assert v.e(1) == 1.0
        assert v.map(lambda x: x * 2).eql(Vector([2, 4, 6]))


class TestMatrix:
    def test_identity_and_accessors(self):
        m = Matrix.I(3)
        assert m.e(1, 1) == 1.0 and m.e(1, 2) == 0.0
        assert m.e(0, 1) is None and m.e(4, 1) is None
        assert m.row(2).eql(Vector([0, 1, 0]))
        assert m.col(3).eql(Vector([0, 0, 1]))
        assert m.dimensions() == {"rows": 3, "cols": 3}
        assert m.isSquare() and not m.isSingular()

    def test_multiply_matrix_vector_scalar(self):
        t = Matrix.Translation(Vector([1, 2, 3]))
        p = t.multiply(Vector([0, 0, 0, 1]))
        assert p.eql(Vector([1, 2, 3, 1]))
        assert (t @ Vector([0, 0, 0, 1])).eql(Vector([1, 2, 3, 1]))
        assert t.multiply(2).e(1, 4) == 2.0
        a = Matrix([[1, 2], [3, 4]])
        assert a.multiply(Matrix.I(2)).eql(a)

    def test_rotations_orthonormal(self):
        for rot in (Matrix.RotationX, Matrix.RotationY, Matrix.RotationZ):
            r = rot(0.7)
            assert r.multiply(r.transpose()).eql(Matrix.I(3))
            assert r.determinant() == pytest.approx(1.0)
        # axis-angle Rodrigues about z == RotationZ
        assert Matrix.Rotation(0.7, Vector([0, 0, 1])).eql(
            Matrix.RotationZ(0.7))
        # 2-D rotation
        assert Matrix.Rotation(np.pi / 2).multiply(Vector([1, 0])).eql(
            Vector([0, 1]))

    def test_rotation_rotates_correctly(self):
        r = Matrix.RotationZ(np.pi / 2)
        assert r.multiply(Vector([1, 0, 0])).eql(Vector([0, 1, 0]))

    def test_scale_translation_layout(self):
        s = Matrix.Scale(Vector([2, 3, 4]))
        assert s.dimensions() == {"rows": 4, "cols": 4}
        assert s.multiply(Vector([1, 1, 1, 1])).eql(Vector([2, 3, 4, 1]))
        t = Matrix.Translation(Vector([5, 6, 7]))
        # translation lives in the last column (ref matrix.js:693-698)
        assert t.e(1, 4) == 5.0 and t.e(3, 4) == 7.0

    def test_inverse_det_trace(self):
        m = Matrix([[2, 0, 0], [0, 4, 0], [0, 0, 8]])
        assert m.determinant() == pytest.approx(64.0)
        assert m.trace() == pytest.approx(14.0)
        assert m.inverse().multiply(m).eql(Matrix.I(3))
        assert Matrix.Zero(2, 2).inverse() is None
        assert Matrix([[1, 2, 3], [2, 4, 6], [1, 1, 1]]).isSingular()
        assert Matrix([[1, 2], [3, 4], [5, 6]]).inverse() is None

    def test_flatten_column_major(self):
        m = Matrix([[1, 2], [3, 4]])
        assert m.flatten() == [1, 3, 2, 4]

    def test_composition_transform_chain(self):
        # scale then translate a point, like reference user scripts do
        s = Matrix.Scale(Vector([2, 2, 2]))
        t = Matrix.Translation(Vector([1, 0, 0]))
        p = t.multiply(s).multiply(Vector([1, 1, 1, 1]))
        assert p.eql(Vector([3, 2, 2, 1]))


def test_namespace_parity():
    """Everything the reference exports (index.js:14-46) exists here."""
    import sail_tpu as S
    for name in ["Renderer", "Scene", "Cube", "Sphere", "Rectangle", "Cone",
                 "Cylinder", "Disk", "Hyperboloid", "Paraboloid", "AreaLight",
                 "PointLight", "SpotLight", "Cornellbox", "Camera", "Control",
                 "Matte", "Mirror", "Metal", "Glass", "UniformColor",
                 "Checkerboard", "Checkerboard2", "Bilerp", "Mix", "Scale",
                 "UV", "Color", "Matrix", "Vector"]:
        assert getattr(S, name) is not None, name
