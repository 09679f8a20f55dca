// Golden-trace generator: runs the reference RocketSim engine (compiled
// in-place, read-only, from /root/reference) over scripted scenarios and
// dumps per-tick state traces for parity testing against the JAX engine.
//
// No reference code is copied into this repository — the reference tree is
// used strictly as a black-box test oracle (BASELINE config #1: seeded
// trajectory replay vs RLGymCPP).
//
// Usage: rs_oracle <in.bin> <out.bin> [cmf_dir]
//   With no cmf_dir the oracle initializes with zero meshes: the soccar
//   world is then the 4 implicit btStaticPlaneShape planes
//   (Arena.cpp:1060-1100), matching the analytic-plane JAX arena on
//   floor/ceiling/side-wall interactions exactly.
//
// Input (little-endian):
//   int32 magic 0x4F52534A ("JSRO")
//   int32 n_scenarios
//   per scenario:
//     int32 n_cars, int32 n_ticks, int32 game_mode (0 soccar)
//     ball: f32 pos[3] vel[3] angvel[3]
//     per car:
//       int32 team
//       f32 pos[3] fwd[3] right[3] up[3] vel[3] angvel[3]   (18)
//       f32 boost
//       f32 is_on_ground has_jumped has_double_jumped has_flipped
//       f32 flip_rel_torque[3]
//       f32 jump_time flip_time is_flipping is_jumping air_time_since_jump
//       f32 time_spent_boosting supersonic_time handbrake_val
//     controls: n_ticks * n_cars * f32[8]
//       (throttle steer pitch yaw roll jump boost handbrake)
// Output:
//   per scenario, per tick:
//     ball: f32 pos[3] vel[3] angvel[3]
//     per car: f32 pos[3] fwd[3] right[3] up[3] vel[3] angvel[3] boost
//       is_on_ground has_jumped has_double_jumped has_flipped is_jumping
//       is_flipping jump_time flip_time air_time_since_jump is_supersonic
//       handbrake_val is_demoed                             (31 floats)

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <map>
#include <vector>

#include "RocketSim.h"
#include "btBulletCollisionCommon.h"

using namespace RocketSim;

// RS_ORACLE_DUMP=1: after each tick, print every persistent-manifold
// contact point (world pos, normal, depth, applied impulses) to stderr.
// Used to calibrate the JAX contact layer against Bullet's actual
// manifold generation + sequential-impulse results.
static void dumpManifolds(Arena* arena, int tick) {
    auto* disp = arena->_bulletWorld.getDispatcher();
    int n = disp->getNumManifolds();
    for (int i = 0; i < n; i++) {
        btPersistentManifold* mf = disp->getManifoldByIndexInternal(i);
        if (mf->getNumContacts() == 0) continue;
        const btCollisionObject* b0 = mf->getBody0();
        const btCollisionObject* b1 = mf->getBody1();
        auto shapeName = [](const btCollisionObject* o) -> const char* {
            switch (o->getCollisionShape()->getShapeType()) {
                case SPHERE_SHAPE_PROXYTYPE: return "sphere";
                case COMPOUND_SHAPE_PROXYTYPE: return "car";
                case BOX_SHAPE_PROXYTYPE: return "box";
                case TRIANGLE_MESH_SHAPE_PROXYTYPE: return "mesh";
                case STATIC_PLANE_PROXYTYPE: return "plane";
                default: return "other";
            }
        };
        for (int p = 0; p < mf->getNumContacts(); p++) {
            const btManifoldPoint& pt = mf->getContactPoint(p);
            btVector3 wb = pt.getPositionWorldOnB();
            btVector3 wa = pt.getPositionWorldOnA();
            btVector3 nn = pt.m_normalWorldOnB;
            std::fprintf(stderr,
                "MF t=%d %s-%s pt=%d/%d posB=(%.4f,%.4f,%.4f) "
                "posA=(%.4f,%.4f,%.4f) n=(%.4f,%.4f,%.4f) d=%.5f "
                "imp=%.4f lat1=%.4f lat2=%.4f lt=%d\n",
                tick, shapeName(b0), shapeName(b1), p, mf->getNumContacts(),
                wb.x(), wb.y(), wb.z(), wa.x(), wa.y(), wa.z(),
                nn.x(), nn.y(), nn.z(), pt.getDistance(),
                pt.getAppliedImpulse(), pt.m_appliedImpulseLateral1,
                pt.m_appliedImpulseLateral2, pt.getLifeTime());
        }
    }
}

static float rf(std::FILE* f) {
    float v;
    if (std::fread(&v, 4, 1, f) != 1) { std::fprintf(stderr, "short read\n"); std::exit(2); }
    return v;
}
static int32_t ri(std::FILE* f) {
    int32_t v;
    if (std::fread(&v, 4, 1, f) != 1) { std::fprintf(stderr, "short read\n"); std::exit(2); }
    return v;
}
static Vec rv(std::FILE* f) { float x = rf(f), y = rf(f), z = rf(f); return Vec(x, y, z); }
static void wf(std::FILE* f, float v) { std::fwrite(&v, 4, 1, f); }
static void wv(std::FILE* f, const Vec& v) { wf(f, v.x); wf(f, v.y); wf(f, v.z); }

int main(int argc, char** argv) {
    if (argc < 3) { std::fprintf(stderr, "usage: rs_oracle in.bin out.bin [cmf_dir]\n"); return 1; }

    std::map<GameMode, std::vector<FileData>> meshes;
    if (argc > 3) {
        std::vector<FileData> files;
        for (auto& e : std::filesystem::directory_iterator(argv[3])) {
            if (e.path().extension() != ".cmf") continue;
            std::ifstream in(e.path(), std::ios::binary);
            files.emplace_back((std::istreambuf_iterator<char>(in)),
                               std::istreambuf_iterator<char>());
        }
        meshes[GameMode::SOCCAR] = files;
    }
    RocketSim::InitFromMem(meshes, true);

    std::FILE* fin = std::fopen(argv[1], "rb");
    std::FILE* fout = std::fopen(argv[2], "wb");
    if (!fin || !fout) { std::fprintf(stderr, "bad file args\n"); return 1; }

    if (ri(fin) != 0x4F52534A) { std::fprintf(stderr, "bad magic\n"); return 1; }
    int32_t nScenarios = ri(fin);

    for (int s = 0; s < nScenarios; s++) {
        int32_t nCars = ri(fin), nTicks = ri(fin), mode = ri(fin);
        Arena* arena = Arena::Create((GameMode)mode);

        BallState bs = {};
        bs.pos = rv(fin); bs.vel = rv(fin); bs.angVel = rv(fin);
        arena->ball->SetState(bs);

        std::vector<Car*> cars;
        for (int c = 0; c < nCars; c++) {
            int32_t team = ri(fin);
            Car* car = arena->AddCar(team == 0 ? Team::BLUE : Team::ORANGE);
            CarState cs = {};
            cs.pos = rv(fin);
            cs.rotMat.forward = rv(fin);
            cs.rotMat.right = rv(fin);
            cs.rotMat.up = rv(fin);
            cs.vel = rv(fin);
            cs.angVel = rv(fin);
            cs.boost = rf(fin);
            cs.isOnGround = rf(fin) > 0.5f;
            cs.hasJumped = rf(fin) > 0.5f;
            cs.hasDoubleJumped = rf(fin) > 0.5f;
            cs.hasFlipped = rf(fin) > 0.5f;
            cs.flipRelTorque = rv(fin);
            cs.jumpTime = rf(fin);
            cs.flipTime = rf(fin);
            cs.isFlipping = rf(fin) > 0.5f;
            cs.isJumping = rf(fin) > 0.5f;
            cs.airTimeSinceJump = rf(fin);
            cs.timeSpentBoosting = rf(fin);
            cs.supersonicTime = rf(fin);
            cs.handbrakeVal = rf(fin);
            car->SetState(cs);
            cars.push_back(car);
        }

        std::vector<float> controls((size_t)nTicks * nCars * 8);
        if (std::fread(controls.data(), 4, controls.size(), fin) != controls.size()) {
            std::fprintf(stderr, "short controls read\n"); return 2;
        }

        for (int t = 0; t < nTicks; t++) {
            for (int c = 0; c < nCars; c++) {
                const float* u = &controls[((size_t)t * nCars + c) * 8];
                CarControls cc = {};
                cc.throttle = u[0]; cc.steer = u[1];
                cc.pitch = u[2]; cc.yaw = u[3]; cc.roll = u[4];
                cc.jump = u[5] > 0.5f; cc.boost = u[6] > 0.5f;
                cc.handbrake = u[7] > 0.5f;
                cars[c]->controls = cc;
            }
            arena->Step(1);
            if (std::getenv("RS_ORACLE_DUMP")) dumpManifolds(arena, t);
            if (std::getenv("RS_ORACLE_DUMP_WHEELS")) {
                for (size_t c = 0; c < cars.size(); c++) {
                    if (t == 0) {
                        btVector3 ii = cars[c]->_rigidBody.getInvInertiaDiagLocal();
                        std::fprintf(stderr, "II c=%zu invI=(%.9g,%.9g,%.9g)\n",
                                     c, ii.x(), ii.y(), ii.z());
                    }
                    auto& veh = cars[c]->_bulletVehicle;
                    for (int w = 0; w < veh.getNumWheels(); w++) {
                        auto& wi = veh.m_wheelInfo[w];
                        std::fprintf(stderr,
                            "WH t=%d c=%zu w=%d hit=%d len=%.5f relv=%.5f "
                            "force=%.4f invdot=%.5f cp=(%.4f,%.4f,%.4f) "
                            "steer=%.6f latf=%.6f longf=%.6f eng=%.6f "
                            "brk=%.6f imp=(%.6f,%.6f,%.6f)\n",
                            t, c, w, (int)wi.m_raycastInfo.m_isInContact,
                            wi.m_raycastInfo.m_suspensionLength,
                            wi.m_suspensionRelativeVelocity,
                            wi.m_wheelsSuspensionForce,
                            wi.m_clippedInvContactDotSuspension,
                            wi.m_raycastInfo.m_contactPointWS.x(),
                            wi.m_raycastInfo.m_contactPointWS.y(),
                            wi.m_raycastInfo.m_contactPointWS.z(),
                            wi.m_steerAngle, wi.m_latFriction,
                            wi.m_longFriction, wi.m_engineForce, wi.m_brake,
                            wi.m_impulse.x(), wi.m_impulse.y(),
                            wi.m_impulse.z());
                    }
                }
            }

            BallState b = arena->ball->GetState();
            wv(fout, b.pos); wv(fout, b.vel); wv(fout, b.angVel);
            for (int c = 0; c < nCars; c++) {
                CarState cs = cars[c]->GetState();
                wv(fout, cs.pos);
                wv(fout, cs.rotMat.forward); wv(fout, cs.rotMat.right);
                wv(fout, cs.rotMat.up);
                wv(fout, cs.vel); wv(fout, cs.angVel);
                wf(fout, cs.boost);
                wf(fout, cs.isOnGround); wf(fout, cs.hasJumped);
                wf(fout, cs.hasDoubleJumped); wf(fout, cs.hasFlipped);
                wf(fout, cs.isJumping); wf(fout, cs.isFlipping);
                wf(fout, cs.jumpTime); wf(fout, cs.flipTime);
                wf(fout, cs.airTimeSinceJump);
                wf(fout, cs.isSupersonic);
                wf(fout, cs.handbrakeVal);
                wf(fout, cs.isDemoed);
            }
        }
        delete arena;
    }
    std::fclose(fin);
    std::fclose(fout);
    return 0;
}
